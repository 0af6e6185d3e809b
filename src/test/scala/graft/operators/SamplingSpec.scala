package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 400L).map { i =>
    (i, s"src${(i % 7) / 2}", s"doc body $i")
  }.toDF("doc_id", "source", "text")

  test("stratifiedSample keeps the configured per-stratum rate, map-side") {
    val out = Sampling.stratifiedSample(corpus, $"source", $"doc_id",
      Map("src0" -> 0.5, "src1" -> 0.0), defaultFraction = 1.0, salt = "s1")
    val bySrc = out.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(!bySrc.contains("src1"))
    // untouched strata keep every row
    assert(bySrc("src2") == corpus.filter($"source" === "src2").count())
    // 50% rate lands near half (md5 buckets are uniform; 115 rows in src0)
    val n0 = bySrc("src0").toDouble
    val tot0 = corpus.filter($"source" === "src0").count().toDouble
    assert(n0 / tot0 > 0.35 && n0 / tot0 < 0.65, s"rate ${n0 / tot0}")
    // append-stable: adding rows never flips an existing decision
    val bigger = corpus.union(Seq((9999L, "src0", "new")).toDF)
    val again = Sampling.stratifiedSample(bigger, $"source", $"doc_id",
      Map("src0" -> 0.5, "src1" -> 0.0), defaultFraction = 1.0, salt = "s1")
      .filter($"doc_id" < 400)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
      out.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("stratifiedExactN equals the window formulation exactly") {
    val n = 9
    val got = Sampling.stratifiedExactN(corpus, $"source", $"doc_id", n, salt = "s2")
      .select($"doc_id", $"source")
    val h = Sampling.hashOrder($"doc_id", "s2")
    val want = corpus
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy(h, $"doc_id")))
      .filter($"rn" <= n)
      .select($"doc_id", $"source")
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // every stratum hit its quota (all strata have >= 9 rows here)
    val counts = got.groupBy($"source").count().as[(String, Long)].collect()
    assert(counts.length == 4 && counts.forall(_._2 == n))
  }

  test("stratifiedExactN caps at stratum size and is partition-invariant") {
    val tiny = corpus.filter($"doc_id" < 5) // all src0, 5 rows
    val out = Sampling.stratifiedExactN(tiny, $"source", $"doc_id", 50, salt = "s3")
    assert(out.count() == 5)
    val spread = Sampling.stratifiedExactN(corpus.repartition(13),
      $"source", $"doc_id", 9, salt = "s2").select("doc_id").as[Long].collect().sorted
    val base = Sampling.stratifiedExactN(corpus,
      $"source", $"doc_id", 9, salt = "s2").select("doc_id").as[Long].collect().sorted
    assert(spread.toSeq == base.toSeq)
  }

  test("MinKAggregator reduce/merge keep the k smallest (h, id) pairs") {
    val agg = new MinKAggregator(3)
    val items = Seq(HashedKey(5, 1), HashedKey(2, 9), HashedKey(2, 3),
      HashedKey(8, 0), HashedKey(1, 7))
    // reduce in two halves then merge, vs reduce sequentially
    val left = items.take(2).foldLeft(agg.zero)(agg.reduce)
    val right = items.drop(2).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(left, right))
    val seq = agg.finish(items.foldLeft(agg.zero)(agg.reduce))
    assert(merged.hs.toSeq == Seq(1L, 2L, 2L) && merged.ids.toSeq == Seq(7L, 3L, 9L))
    assert(seq.hs.toSeq == merged.hs.toSeq && seq.ids.toSeq == merged.ids.toSeq)
  }

  test("stratifiedExactN keeps NULL strata as their own group") {
    val withNull = corpus.withColumn("source",
      when($"doc_id" % 10 === 0, lit(null)).otherwise($"source"))
    val out = Sampling.stratifiedExactN(withNull, $"source", $"doc_id", 5, salt = "s4")
    assert(out.filter($"source".isNull).count() == 5)
  }

  test("weightedExactN equals the sort formulation exactly and is partition-invariant") {
    val df = (0L until 300L).map(i => (i, 1L + i % 17)).toDF("doc_id", "w")
    val expect = df
      .withColumn("e", Sampling.weightedOrder($"doc_id", $"w", "wt1"))
      .orderBy($"e", $"doc_id").limit(40)
      .select($"doc_id").as[Long].collect().toSet
    for (parts <- Seq(1, 7)) {
      val got = Sampling.weightedExactN(df.repartition(parts), $"doc_id",
        $"w", 40, salt = "wt1").select($"doc_id").as[Long].collect().toSet
      assert(got == expect, s"parts=$parts")
    }
    assert(expect.size == 40)
  }

  test("weightedExactN selection probability tracks weight") {
    // two weight classes, 100 items each: w=9 items should dominate a
    // 50-item sample (expected ~45 of them) across salts
    val df = (0L until 200L).map(i => (i, if (i < 100) 9L else 1L))
      .toDF("doc_id", "w")
    val heavyCounts = Seq("a", "b", "c").map { salt =>
      Sampling.weightedExactN(df, $"doc_id", $"w", 50, salt = salt)
        .filter($"doc_id" < 100).count()
    }
    heavyCounts.foreach(c => assert(c > 30, s"heavy picked only $c of 50"))
  }

  test("weightedExactN returns everything when n exceeds the row count") {
    val df = (0L until 8L).map(i => (i, i + 1)).toDF("doc_id", "w")
    assert(Sampling.weightedExactN(df, $"doc_id", $"w", 50).count() == 8)
  }
}
