package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importanceWeights matches the hand-computed add-one LLR") {
    // target docs use 'a', raw pool is a/b-balanced; vocab covers both.
    // counts: a -> cr=3 (2 target + 1 raw), ct=2; b -> cr=3, ct=0
    // Nr=6, Nt=2, V=2: w(a) = ln(3/4) - ln(4/8), w(b) = ln(1/4) - ln(4/8)
    val docs = Seq(
      (1L, Seq("a", "a"), true), (2L, Seq("b", "b"), false),
      (3L, Seq("a", "b"), false), (4L, Seq.empty[String], false))
      .toDF("id", "toks", "tgt")
    val wa = math.log(3.0 / 4.0) - math.log(4.0 / 8.0)
    val wb = math.log(1.0 / 4.0) - math.log(4.0 / 8.0)
    val got = Dsir.importanceWeights(docs, $"id", $"toks", $"tgt", 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 2 * wa) < 1e-12, s"doc1 ${got(1L)}")
    assert(math.abs(got(2L) - 2 * wb) < 1e-12, s"doc2 ${got(2L)}")
    assert(math.abs(got(3L) - (wa + wb)) < 1e-12, s"doc3 ${got(3L)}")
    assert(got(4L) == 0.0, "no-token doc scores 0")
    // target-typical docs outrank raw-typical ones
    assert(got(1L) > 0 && got(2L) < 0)
  }

  test("vocab cutoff is deterministic and bounds the model") {
    // 3 distinct tokens, vocabSize 2: the count-desc/token-asc cutoff
    // keeps {x (4), a (2)} and drops b (2, ties with a, 'a' < 'b')
    val docs = Seq(
      (1L, Seq("x", "x", "a", "b"), true),
      (2L, Seq("x", "x", "a", "b"), false))
      .toDF("id", "toks", "tgt")
    // in-vocab occurrences only: Nr=6, Nt=3, V=2
    // w(x) = ln(3/5) - ln(5/8); w(a) = ln(2/5) - ln(3/8)
    val wx = math.log(3.0 / 5.0) - math.log(5.0 / 8.0)
    val wa = math.log(2.0 / 5.0) - math.log(3.0 / 8.0)
    val got = Dsir.importanceWeights(docs, $"id", $"toks", $"tgt", 2)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - (2 * wx + wa)) < 1e-12, s"doc1 ${got(1L)}")
    assert(got(1L) == got(2L), "same tokens, same weight")
  }

  test("emitTokenCount emits n_toks from the scoring pass itself — " +
    "out-of-vocab tokens count, zero-token docs report 0") {
    val docs = Seq(
      (1L, Seq("a", "a", "zz"), true), // zz falls outside vocabSize=1
      (2L, Seq("b"), false),
      (3L, Seq.empty[String], false)).toDF("id", "toks", "tgt")
    val got = Dsir.importanceWeights(docs, $"id", $"toks", $"tgt", 1,
      emitTokenCount = true)
    assert(got.columns.toSeq == Seq("id", "n_toks", "llr"))
    val counts = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
    // exactly ONE id-carrying explode: the scoring stream. (The fit
    // side's vocab subtree is referenced twice — totals and model — so
    // its id-less Generate legitimately appears twice; a wrapper-style
    // re-tokenize would add a SECOND id-carrying token pass.)
    val gens = got.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.count(_.requiredChildOutput.exists(_.name == "id")) == 1,
      got.queryExecution.optimizedPlan.toString)
  }
}
