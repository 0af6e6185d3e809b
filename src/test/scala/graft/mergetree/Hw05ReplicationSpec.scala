package graft.mergetree

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.StateSketches

/** Replicates the reference's homeworks/hw05.md captured outputs — the
  * corpus's own acceptance test for the MergeTree engine family — through
  * graft's FINAL views and -State/-Merge sketches.
  */
class Hw05ReplicationSpec extends SparkSpec {
  import spark.implicits._

  test("tbl1 VersionedCollapsingMergeTree FINAL (hw05.md:12-53)") {
    // INSERT (u,5,146,-1,1); INSERT (u,5,146,1,1),(u,6,185,1,2)
    // FINAL → exactly (u,6,185,1,2)
    val u = 4324182021466249494L
    val df = Seq(
      (u, 5, 146, -1, 1, 1L), (u, 5, 146, 1, 1, 2L), (u, 6, 185, 1, 2, 3L)
    ).toDF("UserID", "PageViews", "Duration", "Sign", "Version", "seq")
    val out = FoldViews.versionedCollapsingFinal(df, Seq("UserID"), "Sign",
        "Version", seq = col("seq"))
      .select($"PageViews", $"Duration", $"Sign", $"Version")
      .as[(Int, Int, Int, Int)].collect().toSeq
    assert(out == Seq((6, 185, 1, 2)))
  }

  test("tbl2 SummingMergeTree fold (hw05.md:59-81)") {
    // INSERT (1,1),(1,2),(2,1) → (1,3),(2,1)
    val df = Seq((1, 1L), (1, 2L), (2, 1L)).toDF("key", "value")
    val out = FoldViews.summingFinal(df, Seq("key"), Seq("value"))
      .as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 3L, 2 -> 1L))
  }

  test("tbl3 ReplacingMergeTree FINAL keeps the last insert (hw05.md:86-125)") {
    val df = Seq(
      (23, "success", "1000", "Confirmed", 1L),
      (23, "success", "2000", "Cancelled", 2L)
    ).toDF("id", "status", "price", "comment", "seq")
    val out = FoldViews.replacingFinal(df, Seq("id", "status"), col("seq"))
      .select($"price", $"comment").as[(String, String)].collect().toSeq
    assert(out == Seq(("2000", "Cancelled")))
  }

  test("tbl5 AggregatingMergeTree uniqState → uniqMerge (hw05.md:148-185)") {
    // tbl4 rows: (0,'2019-11-11',1),(1,'2019-11-12',1); states per
    // (CounterID, StartDate); uniqMerge per group → 1 and 1
    val tbl4 = Seq((0, "2019-11-11", 1L), (1, "2019-11-12", 1L))
      .toDF("CounterID", "StartDate", "UserID")
    val tbl5 = tbl4.groupBy($"CounterID", $"StartDate")
      .agg(StateSketches.uniqState($"UserID".cast("string")).as("UserID"))
    val out = tbl5.groupBy($"CounterID", $"StartDate")
      .agg(StateSketches.uniqMerge($"UserID").as("state"))
      .select($"state").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L))
  }

  test("tbl6 CollapsingMergeTree FINAL (hw05.md:190-232)") {
    val df = Seq(
      (23, "success", "1000", "Confirmed", 1, 1L),
      (23, "success", "1000", "Confirmed", -1, 2L),
      (23, "success", "2000", "Cancelled", 1, 3L)
    ).toDF("id", "status", "price", "comment", "sign", "seq")
    val out = FoldViews.collapsingFinal(df, Seq("id", "status"), "sign", col("seq"))
      .select($"price", $"comment", $"sign")
      .as[(String, String, Int)].collect().toSeq
    assert(out == Seq(("2000", "Cancelled", 1)))
  }
}
