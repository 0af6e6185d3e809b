package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StatAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("entropy matches the closed form and survives partial merges") {
    // 8 a, 4 b, 4 c over 16 rows: H = -(1/2 log 1/2 + 2 * 1/4 log 1/4) = 1.5
    val rows = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(4)("c")
    val df = spark.createDataset(rows).toDF("v").repartition(7)
    val h = df.agg(StatAggregates.entropy($"v")).as[Double].head()
    assert(math.abs(h - 1.5) < 1e-12, s"got $h")
  }

  test("entropy of a constant column is 0, of an empty group 0, nulls skipped") {
    val h1 = Seq("x", "x", "x").toDF("v").agg(StatAggregates.entropy($"v"))
      .as[Double].head()
    assert(h1 == 0.0)
    val h2 = Seq(Some("a"), None, Some("b"), None).toDF("v")
      .agg(StatAggregates.entropy($"v")).as[Double].head()
    assert(math.abs(h2 - 1.0) < 1e-12, s"got $h2")
  }

  test("uniqUpTo is exact below N and pegs at N+1 above, across merges") {
    // group g holds values u0..u_g, each repeated 5 times → g+1 distinct
    val df = (0 until 7).flatMap(g =>
        (0 to g).flatMap(j => Seq.fill(5)((g, s"u$j"))))
      .toDF("g", "v").repartition(9)
    val got = df.groupBy($"g")
      .agg(StatAggregates.uniqUpTo($"v", 3).as("u"))
      .as[(Int, Long)].collect().toMap
    // group g has distinct values u0..u_{g} → g+1 distinct, capped at 4
    (0 until 7).foreach { g =>
      val expect = math.min(g + 1L, 4L)
      assert(got(g) == expect, s"g=$g got ${got(g)} want $expect")
    }
  }

  test("uniqUpTo state never exceeds N+1 entries") {
    // 10k distinct values in one group: finish must still say N+1; the
    // bounded reduce/merge paths are what keep state O(N)
    val df = (0 until 10000).map(i => s"v$i").toDF("v").repartition(13)
    val got = df.agg(StatAggregates.uniqUpTo($"v", 5)).as[Long].head()
    assert(got == 6L)
  }

  test("sumForEach/avgForEach align ragged arrays by position across merges") {
    val df = Seq(
      ("g", Seq(1.0, 2.0, 3.0)),
      ("g", Seq(10.0, 20.0)),
      ("g", Seq(100.0))
    ).toDF("g", "arr").repartition(3)
    val got = df.groupBy($"g").agg(
      StatAggregates.sumForEach($"arr").as("s"),
      StatAggregates.avgForEach($"arr").as("a"))
      .as[(String, Seq[Double], Seq[Double])].head()
    assert(got._2 == Seq(111.0, 22.0, 3.0))
    assert(got._3 == Seq(37.0, 11.0, 3.0)) // per-position row counts 3,2,1
  }

  test("sumForEach skips null arrays") {
    val df = Seq(Some(Seq(1.0, 1.0)), None, Some(Seq(2.0, 2.0)))
      .toDF("arr")
    val got = df.agg(StatAggregates.sumForEach($"arr"))
      .as[Seq[Double]].head()
    assert(got == Seq(3.0, 3.0))
  }

  test("histogram(N): bounded bins, exact total weight, ordered centers, merge-stable") {
    import StatAggregates.HBin
    val xs = (0 until 1000).map(i => (i * 37 % 100).toDouble)
    val df = spark.createDataset(xs).toDF("x").repartition(9)
    val bins = df.agg(StatAggregates.histogramAgg($"x", 8))
      .as[Seq[HBin]].head()
    assert(bins.length <= 8 && bins.nonEmpty)
    assert(math.abs(bins.map(_.w).sum - 1000.0) < 1e-9)
    assert(bins.map(_.c) == bins.map(_.c).sorted)
    assert(bins.head.c >= 0.0 && bins.last.c <= 99.0)
    // small exact case: <= N distinct values are reproduced exactly
    val exact = Seq(1.0, 1.0, 5.0, 9.0).toDF("x")
      .agg(StatAggregates.histogramAgg($"x", 8)).as[Seq[HBin]].head()
    assert(exact == Seq(HBin(1.0, 2.0), HBin(5.0, 1.0), HBin(9.0, 1.0)))
  }

  test("histogram(N) skips NULL inputs (CH/DuckDB aggregate semantics)") {
    import StatAggregates.HBin
    val got = Seq(Some(1.0), None, Some(1.0), None, Some(5.0)).toDF("x")
      .agg(StatAggregates.histogramAgg($"x", 8)).as[Seq[HBin]].head()
    assert(got == Seq(HBin(1.0, 2.0), HBin(5.0, 1.0)))
  }

  test("kurtPop is non-excess (uniform two-point distribution has kurtosis 1)") {
    // x in {0,1} equally likely: m4/sigma^4 = 1 exactly
    val df = Seq.fill(50)(0.0).++(Seq.fill(50)(1.0)).toDF("x")
    val k = df.agg(StatAggregates.kurtPop($"x")).as[Double].head()
    assert(math.abs(k - 1.0) < 1e-9, s"got $k")
    val s = df.agg(StatAggregates.skewPop($"x")).as[Double].head()
    assert(math.abs(s) < 1e-9, s"got $s")
  }

  test("welch/student t-tests match hand-computed reference values") {
    // sample1 = [1,2,3,4] (m=2.5, v=5/3), sample2 = [2,4,6,8] (m=5, v=20/3)
    // welch: t = -2.5/sqrt(25/12) = -1.7321, df (Welch–Satterthwaite) = 4.4118
    // student: sp2 = 25/6, t = -1.7321, df = 6
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map((_, true)) ++
      Seq(2.0, 4.0, 6.0, 8.0).map((_, false))).toDF("x", "g")
    val r = df.agg(StatAggregates.welchTTest($"x", $"g").as("w"),
        StatAggregates.studentTTest($"x", $"g").as("s"))
      .select(round($"w.t", 4), round($"w.df", 4), round($"s.t", 4), $"s.df")
      .head()
    assert(r.getDouble(0) == -1.7321, s"welch t ${r.getDouble(0)}")
    assert(r.getDouble(1) == 4.4118, s"welch df ${r.getDouble(1)}")
    assert(r.getDouble(2) == -1.7321, s"student t ${r.getDouble(2)}")
    assert(r.getDouble(3) == 6.0, s"student df ${r.getDouble(3)}")
  }

  test("mannWhitneyU matches hand-computed U and tie-corrected z") {
    // no ties: x1={1,2,4}, x2={3,5} -> R1=7, U1=1, U2=5, z=-2/sqrt(3)
    val a = (Seq(1.0, 2.0, 4.0).map((_, true)) ++ Seq(3.0, 5.0).map((_, false)))
      .map { case (v, g) => (0L, v, g) }
    // ties: x1={1,2,2}, x2={2,3} -> avg rank of 2 is 3, U1=1, U2=5,
    // tie sum 24 -> sigma^2 = 2.4, z = -2/sqrt(2.4)
    val b = (Seq(1.0, 2.0, 2.0).map((_, true)) ++ Seq(2.0, 3.0).map((_, false)))
      .map { case (v, g) => (1L, v, g) }
    val df = (a ++ b).toDF("k", "x", "g")
    val got = StatAggregates.mannWhitneyU(df, $"k", $"x", $"g")
      .select($"key", $"u1", $"u2", round($"z", 4))
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == ((1.0, 5.0, -1.1547)), s"no-tie case ${got(0L)}")
    assert(got(1L) == ((1.0, 5.0, -1.291)), s"tie case ${got(1L)}")
  }

  test("kolmogorovSmirnov matches hand-computed D with and without ties") {
    // x1={1,2,3}, x2={2.5,4}: ECDF gaps at 1:1/3, 2:2/3, 2.5:2/3-1/2=1/6,
    // 3:1-1/2=1/2, 4:0 -> D = 2/3
    val a = (Seq(1.0, 2.0, 3.0).map((_, true)) ++ Seq(2.5, 4.0).map((_, false)))
      .map { case (v, g) => (0L, v, g) }
    // tie across samples: x1={1,2}, x2={2,3} -> at 2 both ECDFs jump
    // together (1, 1/2) -> D = 1/2 (at value 1), not 1
    val b = (Seq(1.0, 2.0).map((_, true)) ++ Seq(2.0, 3.0).map((_, false)))
      .map { case (v, g) => (1L, v, g) }
    val got = StatAggregates.kolmogorovSmirnov(
        (a ++ b).toDF("k", "x", "g"), $"k", $"x", $"g")
      .select($"key", round($"d", 4))
      .as[(Long, Double)].collect().toMap
    assert(got(0L) == 0.6667, s"no-tie D ${got(0L)}")
    assert(got(1L) == 0.5, s"tie D ${got(1L)}")
  }

  test("lttb: endpoints kept, subset of input, x-monotonic, spikes survive") {
    val rnd = new scala.util.Random(5)
    val flat = (0 until 200).map(i => (i.toDouble, 1.0 + rnd.nextGaussian() * 0.01))
    // plant a huge spike mid-series: any sane downsample must keep it
    val pts = flat.updated(117, (117.0, 50.0))
    val out = StatAggregates.lttb(pts, 12)
    assert(out.length == 12)
    assert(out.head == pts.head && out.last == pts.last)
    assert(out.toSet.subsetOf(pts.toSet))
    assert(out.map(_._1) == out.map(_._1).sorted, "x must stay monotonic")
    assert(out.contains((117.0, 50.0)), "the spike must be selected")
    // short series pass through untouched
    assert(StatAggregates.lttb(pts.take(5), 12) == pts.take(5))
  }

  test("theilsU: determined = 1, independent = 0, asymmetric in between") {
    // a = f(b): U(a|b) = 1; uniform independence: U = 0
    val det = Seq(("x", "1"), ("y", "2"), ("x", "1"), ("y", "2")).toDF("a", "b")
    assert(det.agg(StatAggregates.theilsU($"a", $"b")).as[Double].head() == 1.0)
    val ind = (for (a <- Seq("x", "y"); b <- Seq("1", "2")) yield (a, b)).toDF("a", "b")
    assert(math.abs(ind.agg(StatAggregates.theilsU($"a", $"b")).as[Double].head()) < 1e-12)
    // b determines a but not vice versa: U(a|b)=1, U(b|a)<1
    val asym = Seq(("x", "1"), ("x", "2"), ("y", "3"), ("y", "4")).toDF("a", "b")
    val uab = asym.agg(StatAggregates.theilsU($"a", $"b")).as[Double].head()
    val uba = asym.agg(StatAggregates.theilsU($"b", $"a")).as[Double].head()
    assert(uab == 1.0 && uba > 0.0 && uba < 1.0, s"got $uab / $uba")
  }

  test("exponentialMovingAverage: constant series is exact, small half-life weights the latest") {
    val df = Seq(
      (0L, 5.0, 0L), (0L, 5.0, 100L), (0L, 5.0, 200L),   // constant -> 5
      (1L, 0.0, 0L), (1L, 10.0, 1000L))                   // hl=1: latest dominates
      .toDF("k", "v", "t")
    val got = StatAggregates.exponentialMovingAverage(df, $"k", $"v", $"t", 1.0)
      .as[(Long, Double)].collect().toMap
    assert(got(0L) == 5.0)
    assert(math.abs(got(1L) - 10.0) < 1e-6, s"got ${got(1L)}")
    // hand-check a two-point decay at hl=100: w = {2^-1, 1}
    val two = StatAggregates.exponentialMovingAverage(
        Seq((0L, 2.0, 0L), (0L, 4.0, 100L)).toDF("k", "v", "t"),
        $"k", $"v", $"t", 100.0)
      .as[(Long, Double)].collect().head._2
    assert(math.abs(two - (2.0 * 0.5 + 4.0) / 1.5) < 1e-12, s"got $two")
  }

  test("rankCorr: monotone = 1, reversed = -1, hand case with ties") {
    val mono = (1 to 6).map(i => (0L, i.toDouble, (i * i).toDouble)) ++
      (1 to 6).map(i => (1L, i.toDouble, -i * 3.0)) ++
      // x=[1,2,3,4], y=[1,3,2,4]: ranks are the values, corr = 0.8
      Seq((2L, 1.0, 1.0), (2L, 2.0, 3.0), (2L, 3.0, 2.0), (2L, 4.0, 4.0)) ++
      // ties both sides: rx=ry=[1,2.5,2.5,4] -> 1.0
      Seq((3L, 1.0, 10.0), (3L, 2.0, 20.0), (3L, 2.0, 20.0), (3L, 3.0, 40.0))
    val got = StatAggregates.rankCorr(mono.toDF("k", "x", "y"), $"k", $"x", $"y")
      .select($"key", round($"rank_corr", 4)).as[(Long, Double)].collect().toMap
    assert(got(0L) == 1.0 && got(1L) == -1.0, s"got $got")
    assert(got(2L) == 0.8, s"hand case ${got(2L)}")
    assert(got(3L) == 1.0, s"tie case ${got(3L)}")
  }

  test("avgWeighted skips rows where either side is NULL") {
    val df = Seq((Some(1.0), Some(1.0)), (Some(2.0), Some(3.0)),
      (None, Some(5.0)), (Some(9.0), None)).toDF("x", "w")
    val got = df.agg(StatAggregates.avgWeighted($"x", $"w")).as[Double].head()
    assert(got == 7.0 / 4.0, s"got $got")
  }

  test("boundingRatio is the chord slope between the x-extremes") {
    val df = Seq((0.0, 10.0), (5.0, 0.0), (10.0, 30.0)).toDF("x", "y")
    assert(df.agg(StatAggregates.boundingRatio($"x", $"y")).as[Double].head() == 2.0)
  }

  test("meanZTest matches the hand-computed known-variance z") {
    // means 2.5 vs 5, v1=1 v2=4, n=4 each: z = -2.5/sqrt(0.25+1)
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map((_, true)) ++
      Seq(2.0, 4.0, 6.0, 8.0).map((_, false))).toDF("x", "g")
    val z = df.agg(round(StatAggregates.meanZTest($"x", $"g", 1.0, 4.0), 4))
      .as[Double].head()
    assert(z == -2.2361, s"got $z")
  }

  test("minMap/maxMap fold map values key-wise with sorted keys") {
    val df = Seq((0L, Map("a" -> 1L)), (0L, Map("a" -> 5L, "b" -> 3L)),
      (1L, Map("b" -> 2L))).toDF("g", "m")
    val mn = ChAggregates.minMap(df, Seq("g"), $"m")
      .as[(Long, Seq[String], Seq[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val mx = ChAggregates.maxMap(df, Seq("g"), $"m")
      .as[(Long, Seq[String], Seq[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mn(0L) == ((Seq("a", "b"), Seq(1L, 3L))), s"min ${mn(0L)}")
    assert(mx(0L) == ((Seq("a", "b"), Seq(5L, 3L))), s"max ${mx(0L)}")
    assert(mn(1L) == ((Seq("b"), Seq(2L))) && mx(1L) == ((Seq("b"), Seq(2L))))
  }

  test("categoricalInformationValue: hand case, zero cells contribute 0") {
    val rows = Seq.fill(2)(("A", true)) ++ Seq(("A", false)) ++
      Seq(("B", true)) ++ Seq.fill(2)(("B", false)) ++ Seq.fill(3)(("C", true))
    val got = StatAggregates.categoricalInformationValue(
        rows.toDF("c", "t"), $"c", $"t")
      .select($"cat", round($"iv", 4)).as[(String, Double)].collect().toMap
    // G=6, B=3: A = (2/6-1/3)ln(1) = 0... recompute: gA=2,bA=1 -> equal rates
    // -> 0; B: (1/6-2/3)ln(1/4) = 0.6931; C: zero bad cell -> 0
    assert(got("A") == 0.0, s"A ${got("A")}")
    assert(got("B") == 0.6931, s"B ${got("B")}")
    assert(got("C") == 0.0, s"C ${got("C")}")
  }
}
