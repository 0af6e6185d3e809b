package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("topK is exact when capacity exceeds distinct count") {
    // zipf-ish: value v_i appears (10 - i) times; repartition so every
    // map side holds a slice and the merge path actually runs
    val rows = (0 until 10).flatMap(i => Seq.fill(10 - i)(s"v$i"))
    val df = spark.createDataset(rows).toDF("v").repartition(7)
    val got = df.agg(HeavyHitters.topK($"v", n = 3)).as[Seq[String]].head()
    assert(got == Seq("v0", "v1", "v2"))
  }

  test("topK tie-break is (count desc, value asc)") {
    val df = Seq("b", "a", "b", "a", "c").toDF("v").repartition(3)
    val got = df.agg(HeavyHitters.topK($"v", n = 3)).as[Seq[String]].head()
    assert(got == Seq("a", "b", "c"))
  }

  test("topK under eviction pressure still surfaces the guaranteed heavy hitter") {
    // 1000 rows, 500 of them "hot" (true freq 0.5 > 1/cap for any cap>2),
    // the rest 250 distinct near-singletons forcing constant eviction
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(500)("hot") ++
      (0 until 500).map(_ => s"cold${rnd.nextInt(250)}")
    val df = spark.createDataset(rnd.shuffle(rows)).toDF("v").repartition(8)
    val got = df.agg(HeavyHitters.topK($"v", n = 1, loadFactor = 3))
      .as[Seq[String]].head()
    assert(got == Seq("hot"))
  }

  test("SpaceSaving guarantee holds on random zipf streams: freq > N/cap is always present") {
    import org.apache.spark.sql.functions.udaf
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish stream over ~120 distinct values, cap far below that
      val rows = Seq.fill(3000)(s"v${(math.pow(rnd.nextDouble(), 3) * 120).toInt}")
      val cap = 24
      val trueCounts = rows.groupBy(identity).view.mapValues(_.size).toMap
      val guaranteed = trueCounts.filter(_._2 > rows.size / cap).keySet
      val summary = spark.createDataset(rows).toDF("v").repartition(6)
        .agg(udaf(new HeavyHitters.TopKFreqAggregator(cap, cap),
          org.apache.spark.sql.Encoders.STRING).apply($"v"))
        .as[Seq[String]].head().toSet
      val missing = guaranteed -- summary
      assert(missing.isEmpty,
        s"seed $seed: guaranteed heavy hitters missing from summary: $missing")
    }
  }

  test("topKWeighted ranks by summed weight") {
    val df = Seq(("a", 1L), ("b", 100L), ("a", 1L), ("c", 50L))
      .toDF("v", "w").repartition(2)
    val got = df.agg(HeavyHitters.topKWeighted($"v", $"w", n = 2))
      .as[Seq[String]].head()
    assert(got == Seq("b", "c"))
  }

  test("topK skips nulls and works grouped") {
    val df = Seq((1, "x"), (1, "x"), (1, null), (2, "y"), (2, "z"), (2, "z"))
      .toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(HeavyHitters.topK($"v", n = 1).as("t"))
      .orderBy($"g").as[(Int, Seq[String])].collect().toSeq
    assert(got == Seq((1, Seq("x")), (2, Seq("z"))))
  }
}
