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

  test("collapsingFinal cancels +1/-1 pairs and keeps latest positive state") {
    val df = Seq(
      (1, 1, 1, 10.0), (1, 2, -1, 10.0), (1, 3, 1, 20.0),  // net +1 → keep ver3
      (2, 1, 1, 5.0), (2, 2, -1, 5.0),                     // net 0 → gone
      (3, 1, 1, 7.0)                                       // lone +1 → keep
    ).toDF("k", "ver", "sign", "v")
    val out = FoldViews.collapsingFinal(df, Seq("k"), "sign", col("ver"))
      .select($"k", $"ver").as[(Int, Int)].collect().toMap
    assert(out == Map(1 -> 3, 3 -> 1))
  }

  test("versionedCollapsingFinal cancels only matching (key, version) pairs") {
    val df = Seq(
      (1, 1, 1, 1L), (1, 1, -1, 2L),   // version 1 cancelled
      (1, 2, 1, 3L),                   // version 2 survives
      (2, 5, -1, 4L), (2, 5, 1, 5L),   // cancelled (order-independent)
      (2, 4, 1, 6L)                    // survives with LOWER version
    ).toDF("k", "ver", "sign", "seq")
    val out = FoldViews.versionedCollapsingFinal(df, Seq("k"), "sign", "ver",
        tiebreak = Seq(col("seq").desc))
      .select($"k", $"ver").as[(Int, Int)].collect().toMap
    assert(out == Map(1 -> 2, 2 -> 4))
  }
}
