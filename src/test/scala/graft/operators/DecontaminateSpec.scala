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

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(8)(r.nextFloat() - 0.5f)
  }

  test("embeddingOverlapReport flags near-eval rows with the closest " +
    "eval id, skips far rows, and never shuffles the corpus side") {
    val evalE = Seq((1L, vec(1)), (2L, vec(2))).toDF("vec_id", "embedding")
    // 100 ~ eval 1 (same direction, scaled); 101 orthogonal-ish random
    val corpusE = Seq(
      (100L, vec(1).map(_ * 3f)), (101L, vec(77)), (102L, vec(2).map(_ * 0.5f)))
      .toDF("vec_id", "embedding")
    val rep = Decontaminate.embeddingOverlapReport(
        corpusE, "vec_id", "embedding", evalE, "vec_id", "embedding",
        minCosine = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == Map(100L -> 1L, 102L -> 2L), rep)
    val plan = Decontaminate.embeddingOverlapReport(
        corpusE, "vec_id", "embedding", evalE, "vec_id", "embedding",
        minCosine = 0.95)
      .queryExecution.executedPlan.toString
    // broadcast nested-loop over the eval side; the only exchange is the
    // argmax aggregation over (already filtered) flagged rows
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan.take(2000))
  }
}
