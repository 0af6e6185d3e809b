package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property tests for the two-sample test family: on random datasets
  * (with deliberate tie mass), the windowed/aggregated Spark spellings
  * must equal naive O(n²)/sort-based reference implementations written
  * in plain Scala — guarding the rank, tie and moment algebra broadly
  * rather than at hand-picked fixtures.
  */
class StatTestsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813)

  private def randomCase(n1: Int, n2: Int): (Seq[Double], Seq[Double]) = {
    // values drawn from a small integer grid over 2 so ties are common
    def draw(n: Int) = Seq.fill(n)(rnd.nextInt(12) / 2.0 + rnd.nextInt(2) * 0.5)
    (draw(n1), draw(n2))
  }

  private def naiveMannWhitney(a: Seq[Double], b: Seq[Double]): (Double, Double, Double) = {
    val all = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    // average ranks with ties
    val ranks = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Double)]
    var i = 0
    while (i < all.length) {
      var j = i
      while (j < all.length && all(j)._1 == all(i)._1) j += 1
      val avg = (i + 1 + j) / 2.0 // mean of ranks i+1..j
      (i until j).foreach(k => ranks += ((all(k)._2, avg)))
      i = j
    }
    val n1 = a.length.toDouble; val n2 = b.length.toDouble; val n = n1 + n2
    val r1 = ranks.collect { case (true, r) => r }.sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val u2 = n1 * n2 - u1
    val tieSum = all.groupBy(_._1).values.map(_.size.toDouble)
      .map(t => t * t * t - t).sum
    val sigma = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - tieSum / (n * (n - 1))))
    val z = (u1 - n1 * n2 / 2.0) / sigma
    (u1, u2, z)
  }

  private def naiveKs(a: Seq[Double], b: Seq[Double]): Double = {
    val values = (a ++ b).distinct.sorted
    values.map { v =>
      val f1 = a.count(_ <= v).toDouble / a.length
      val f2 = b.count(_ <= v).toDouble / b.length
      math.abs(f1 - f2)
    }.max
  }

  private def naiveWelch(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
    def meanVar(x: Seq[Double]) = {
      val m = x.sum / x.length
      (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
    }
    val (m1, v1) = meanVar(a); val (m2, v2) = meanVar(b)
    val se1 = v1 / a.length; val se2 = v2 / b.length
    val t = (m1 - m2) / math.sqrt(se1 + se2)
    val df = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (a.length - 1) + se2 * se2 / (b.length - 1))
    (t, df)
  }

  test("mannWhitneyU equals the naive rank computation on 30 random tied datasets") {
    val cases = (0 until 30).map { i =>
      val (a, b) = randomCase(5 + rnd.nextInt(40), 5 + rnd.nextInt(40))
      (i.toLong, a, b)
    }
    val df = cases.flatMap { case (k, a, b) =>
      a.map(v => (k, v, true)) ++ b.map(v => (k, v, false))
    }.toDF("k", "x", "g")
    val got = StatAggregates.mannWhitneyU(df, $"k", $"x", $"g")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    cases.foreach { case (k, a, b) =>
      val (u1, u2, z) = naiveMannWhitney(a, b)
      val (gu1, gu2, gz) = got(k)
      assert(math.abs(gu1 - u1) < 1e-9 && math.abs(gu2 - u2) < 1e-9,
        s"case $k: U ($gu1,$gu2) != naive ($u1,$u2)")
      assert(math.abs(gz - z) < 1e-9, s"case $k: z $gz != naive $z")
    }
  }

  test("kolmogorovSmirnov equals the naive ECDF sweep on 30 random tied datasets") {
    val cases = (0 until 30).map { i =>
      val (a, b) = randomCase(5 + rnd.nextInt(40), 5 + rnd.nextInt(40))
      (i.toLong, a, b)
    }
    val df = cases.flatMap { case (k, a, b) =>
      a.map(v => (k, v, true)) ++ b.map(v => (k, v, false))
    }.toDF("k", "x", "g")
    val got = StatAggregates.kolmogorovSmirnov(df, $"k", $"x", $"g")
      .select($"key", $"d").as[(Long, Double)].collect().toMap
    cases.foreach { case (k, a, b) =>
      val d = naiveKs(a, b)
      assert(math.abs(got(k) - d) < 1e-9, s"case $k: D ${got(k)} != naive $d")
    }
  }

  test("welchTTest equals the naive two-pass moments on 30 random datasets") {
    val cases = (0 until 30).map { i =>
      val (a, b) = randomCase(5 + rnd.nextInt(40), 5 + rnd.nextInt(40))
      (i.toLong, a, b)
    }
    val df = cases.flatMap { case (k, a, b) =>
      a.map(v => (k, v, true)) ++ b.map(v => (k, v, false))
    }.toDF("k", "x", "g")
    val got = df.groupBy($"k")
      .agg(StatAggregates.welchTTest($"x", $"g").as("w"))
      .select($"k", $"w.t", $"w.df").as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    cases.foreach { case (k, a, b) =>
      val (t, dfree) = naiveWelch(a, b)
      val (gt, gdf) = got(k)
      // var_samp's streaming co-moment vs the naive two-pass differ in ULPs
      assert(math.abs(gt - t) < 1e-7, s"case $k: t $gt != naive $t")
      assert(math.abs(gdf - dfree) < 1e-6, s"case $k: df $gdf != naive $dfree")
    }
  }

  private def naiveSpearman(xs: Seq[Double], ys: Seq[Double]): Double = {
    def avgRanks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      // average rank of a value = mean of its 1-based positions in sort order
      val byValue = sorted.zipWithIndex.groupBy(_._1)
        .map { case (x, ps) => x -> (ps.map(_._2 + 1).sum.toDouble / ps.size) }
      v.map(byValue)
    }
    val (rx, ry) = (avgRanks(xs), avgRanks(ys))
    val n = xs.length
    val (mx, my) = (rx.sum / n, ry.sum / n)
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum)
    val sy = math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    cov / (sx * sy)
  }

  test("rankCorr equals naive Spearman on 30 random tied datasets") {
    val cases = (0 until 30).map { i =>
      val n = 8 + rnd.nextInt(60)
      // second column partially follows the first so corr spans the range
      val xs = Seq.fill(n)(rnd.nextInt(12) / 2.0)
      val ys = xs.map(x => x * (if (rnd.nextBoolean()) 1 else -1) +
        rnd.nextInt(6) / 2.0)
      (i.toLong, xs, ys)
    }
    val df = cases.flatMap { case (k, xs, ys) =>
      xs.zip(ys).map { case (x, y) => (k, x, y) }
    }.toDF("k", "x", "y")
    val got = StatAggregates.rankCorr(df, $"k", $"x", $"y")
      .select($"key", $"rank_corr").as[(Long, Double)].collect().toMap
    cases.foreach { case (k, xs, ys) =>
      val ref = naiveSpearman(xs, ys)
      assert(math.abs(got(k) - ref) < 1e-9, s"case $k: ${got(k)} != naive $ref")
    }
  }
}
