package graft.mergetree

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FoldViewsSpec extends SparkSpec {
  import spark.implicits._

  test("replacingFinal keeps highest version per key") {
    val df = Seq((1, 1, "old"), (1, 3, "new"), (1, 2, "mid"), (2, 1, "only"))
      .toDF("k", "ver", "s")
    val out = FoldViews.replacingFinal(df, Seq("k"), col("ver"))
      .select($"k", $"s").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "new", 2 -> "only"))
  }

  test("summingFinal folds value columns by key") {
    val df = Seq((1, 100L, "x"), (1, 250L, "y"), (2, 5L, "z")).toDF("k", "v", "s")
    val out = FoldViews.summingFinal(df, Seq("k"), Seq("v"))
    assert(out.columns.toSeq == Seq("k", "v", "s"))
    val m = out.select($"k", $"v").as[(Int, Long)].collect().toMap
    assert(m == Map(1 -> 350L, 2 -> 5L))
  }

  test("collapsingFinal replicates the reference demo (lecture_07.md:680-736)") {
    // INSERT (1,7,100,1); INSERT (1,7,100,-1),(1,8,150,1) → FINAL = (1,8,150,1)
    val df = Seq(
      (1, 7, 100, 1, 1L), (1, 7, 100, -1, 2L), (1, 8, 150, 1, 3L)
    ).toDF("id", "pageViews", "duration", "sign", "seq")
    val out = FoldViews.collapsingFinal(df, Seq("id"), "sign", col("seq"))
      .select($"id", $"pageViews", $"duration", $"sign")
      .as[(Int, Int, Int, Int)].collect().toSeq
    assert(out == Seq((1, 8, 150, 1)))
  }

  test("collapsingFinal keeps first surplus cancel row on negative net") {
    val df = Seq(
      (1, 1, 1, 10.0), (1, 2, -1, 10.0), (1, 3, 1, 20.0),  // net +1 → keep ver3
      (2, 1, 1, 5.0), (2, 2, -1, 5.0),                     // net 0 → gone
      (3, 1, 1, 7.0),                                      // lone +1 → keep
      (4, 1, -1, 9.0), (4, 2, -1, 9.5)                     // net -2 → first -1
    ).toDF("k", "ver", "sign", "v")
    val out = FoldViews.collapsingFinal(df, Seq("k"), "sign", col("ver"))
      .select($"k", $"ver").as[(Int, Int)].collect().toMap
    assert(out == Map(1 -> 3, 3 -> 1, 4 -> 1))
  }

  test("GraphiteRollup thins by age band: fine recent, coarse old") {
    // now = 10000s; retention: age>=3600 → 600s step, age>=7200 → 3600s step
    val rows = (0 until 10000 by 60).map(t => ("cpu", t.toLong, 1.0))
    val df = rows.toDF("path", "t", "v")
    val out = GraphiteRollup.rollup(df, "path", "t", "v", lit(10000L),
      Seq((3600L, 600L), (7200L, 3600L)))
    val buckets = out.select($"t", $"points_folded").as[(Long, Long)].collect().toMap
    // old region (age>=7200 → t <= 2800): 3600s buckets folding 60 points
    assert(buckets(0L) == 47L)      // t in [0, 2820] at 60s spacing
    // mid region: 600s buckets
    assert(buckets(3600L) == 10L)
    // recent region (age < 3600 → t > 6400): full precision
    assert(buckets(6420L) == 1L)
    // total points preserved across folds
    assert(out.agg(sum($"points_folded")).as[Long].head() == rows.length)
  }

  test("versionedCollapsingFinal replicates the reference demo (lecture_07.md:738-790)") {
    // inserts: (1,'state_1',1,1),(1,'state_2',1,1),(1,'state_3',1,1),
    //          (1,'cancel state',-1,1),
    //          (1,'state_1',1,5),(1,'state_2',1,4),(1,'state_3',1,3),
    //          (1,'cancel state',-1,5)
    // captured FINAL: state_1 v1, state_2 v1, state_3 v3, state_2 v4
    val df = Seq(
      (1, "state_1", 1, 1, 1L), (1, "state_2", 1, 1, 2L), (1, "state_3", 1, 1, 3L),
      (1, "cancel state", -1, 1, 4L),
      (1, "state_1", 1, 5, 5L), (1, "state_2", 1, 4, 6L), (1, "state_3", 1, 3, 7L),
      (1, "cancel state", -1, 5, 8L)
    ).toDF("id", "val", "sign", "version", "seq")
    val out = FoldViews.versionedCollapsingFinal(df, Seq("id"), "sign", "version",
        seq = col("seq"))
      .select($"val", $"version").as[(String, Int)].collect().toSet
    assert(out == Set(("state_1", 1), ("state_2", 1), ("state_3", 3), ("state_2", 4)))
  }
}
