package graft.operators

import graft.SparkSpec

/** Benchmark decontamination via winnowing-fingerprint containment. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "the quick brown fox jumps over the lazy dog near the river bank today"

  private val corpus = Seq(
    (100L, s"intro text before. $passage and then some trailing words here"),
    (101L, "completely unrelated content about distributed query engines and shuffles"),
    (102L, passage)) // verbatim copy
    .toDF("doc_id", "text")

  private val evalSet = Seq(
    (1L, passage),
    (2L, "another benchmark item with nothing in common with the corpus rows"))
    .toDF("doc_id", "text")

  test("overlapReport flags containing docs with high containment, skips unrelated") {
    val rep = Decontaminate.overlapReport(corpus, "doc_id", "text",
        evalSet, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // both the embedding doc and the verbatim copy share eval doc 1's runs
    assert(rep.contains((100L, 1L)) && rep.contains((102L, 1L)), rep.keys)
    assert(!rep.keys.exists(_._2 == 2L)) // unrelated eval item never matches
    assert(!rep.keys.exists(_._1 == 101L)) // unrelated corpus doc never flagged
    // verbatim copy contains every eval fingerprint
    assert(rep((102L, 1L)).getAs[Double]("containment4") == 1.0)
    assert(rep((100L, 1L)).getAs[Long]("shared_fps") >= 2L)
  }

  test("dropContaminated removes exactly the flagged docs") {
    val kept = Decontaminate.dropContaminated(corpus, "doc_id", "text",
        evalSet, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(101L))
  }

  test("eval fingerprints are the broadcast side") {
    val plan = Decontaminate.overlapReport(corpus, "doc_id", "text",
        evalSet, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
