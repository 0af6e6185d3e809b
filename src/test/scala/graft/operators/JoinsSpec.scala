package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoinBinned equals the naive cross-filter on random intervals") {
    val rnd = new scala.util.Random(17)
    val points = (0 until 500).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "pt")
    val intervals = (0 until 80).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (1000L + i, lo, lo + rnd.nextInt(600))
    }.toDF("iid", "lo", "hi")
    val naive = points.crossJoin(intervals)
      .filter($"pt" >= $"lo" && $"pt" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    for (binWidth <- Seq(1L, 64L, 256L, 5000L, 100000L)) {
      val binned = Joins.rangeJoinBinned(points, "pt", intervals, "lo", "hi",
          binWidth)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(binned == naive, s"binWidth=$binWidth: ${binned.size} vs ${naive.size}")
    }
  }

  test("asofLeftNative (custom exec): equals the window formulation on a randomized fixture") {
    val rnd = new scala.util.Random(31)
    val left = (1 to 4000).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100)))
      .toDF("k", "t", "payload").repartition(7)
    val right = (1 to 3000).map(_ =>
        (rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .distinct // unique (k,t,v); ties on (k,t) would be ambiguous by spec
      .toDF("k", "t", "v").repartition(5)
    // dedupe right on (k,t) — both formulations document this requirement
    val rightU = right.groupBy($"k", $"t").agg(max($"v").as("v"))

    val native = Joins.asofLeftNative(left, rightU, "k", "t", "t", Seq("t", "v"))
    val window = Joins.asofLeft(left, rightU, "k", "t", "t", Seq("t", "v"))
    assert(native.count() == 4000)
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)

    // the plan is the custom operator, not a union+window
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(1500))
    assert(!plan.contains("Window"), "native asof must not plan a window")
  }

  test("asofLeftNative: inclusive match, null keys/times never match") {
    val left = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(20L), "incl"),
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(4L), "early"),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(30L), "nullk"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], "nullt"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "r5"), (1L, 20L, "r20")).toDF("k", "t", "v")
    val got = Joins.asofLeftNative(left, right, "k", "t", "t", Seq("v"))
      .select($"tag", $"asof_v").as[(String, Option[String])]
      .collect().toMap
    assert(got == Map("incl" -> Some("r20"), "early" -> None,
      "nullk" -> None, "nullt" -> None))
  }

  test("asofLeftNativeMulti: two equi-keys before the inequality") {
    val left = Seq(("eu", 1L, 100L, "a"), ("eu", 2L, 100L, "b"), ("us", 1L, 100L, "c"))
      .toDF("region", "k", "t", "tag")
    val right = Seq(
      ("eu", 1L, 50L, 1.0), ("eu", 1L, 90L, 2.0),
      ("eu", 2L, 100L, 3.0), ("us", 2L, 10L, 9.0))
      .toDF("region", "k", "t", "v")
    val got = Joins.asofLeftNativeMulti(left, right, Seq("region", "k"),
        "t", "t", Seq("v"))
      .select($"tag", $"asof_v").as[(String, Option[Double])].collect().toMap
    assert(got == Map("a" -> Some(2.0), "b" -> Some(3.0), "c" -> None))

    // ASOF INNER (ClickHouse default): unmatched left rows drop
    val inner = Joins.asofNativeMulti(left, right, Seq("region", "k"),
        "t", "t", Seq("v"), leftOuter = false)
      .select($"tag", $"asof_v").as[(String, Double)].collect().toMap
    assert(inner == Map("a" -> 2.0, "b" -> 3.0))
  }

  test("asofNativeMulti: all four ON-clause inequalities on a boundary fixture") {
    // rights at t = 5, 10, 20 for key 1; left row exactly at t = 10 so each
    // direction/strictness picks a different neighbor
    val left = Seq((1L, 10L, "x"), (1L, 3L, "lo"), (1L, 25L, "hi"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "r5"), (1L, 10L, "r10"), (1L, 20L, "r20"))
      .toDF("k", "t", "v")
    def run(forward: Boolean, strict: Boolean) =
      Joins.asofNativeMulti(left, right, Seq("k"), "t", "t", Seq("v"),
          leftOuter = true, forward = forward, strict = strict)
        .select($"tag", $"asof_v").as[(String, Option[String])].collect().toMap
    // backward >= : latest right at-or-before
    assert(run(forward = false, strict = false) ==
      Map("x" -> Some("r10"), "lo" -> None, "hi" -> Some("r20")))
    // backward > : latest right strictly before
    assert(run(forward = false, strict = true) ==
      Map("x" -> Some("r5"), "lo" -> None, "hi" -> Some("r20")))
    // forward <= : earliest right at-or-after
    assert(run(forward = true, strict = false) ==
      Map("x" -> Some("r10"), "lo" -> Some("r5"), "hi" -> None))
    // forward < : earliest right strictly after
    assert(run(forward = true, strict = true) ==
      Map("x" -> Some("r20"), "lo" -> Some("r5"), "hi" -> None))
  }

  test("asofNativeMulti forward: equals a brute-force formulation on a randomized fixture") {
    val rnd = new scala.util.Random(47)
    val left = (1 to 3000).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(800).toLong, rnd.nextInt(100)))
      .toDF("k", "t", "payload").repartition(7)
    val rightU = (1 to 2500).map(_ =>
        (rnd.nextInt(50).toLong, rnd.nextInt(800).toLong, rnd.nextDouble()))
      .toDF("k", "t", "v").groupBy($"k", $"t").agg(max($"v").as("v"))

    val native = Joins.asofNativeMulti(left, rightU, Seq("k"), "t", "t",
      Seq("t", "v"), forward = true, strict = true)
    // oracle: theta-join then keep the earliest strictly-later right per left row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lid").orderBy($"rt".asc)
    val brute = left.withColumn("lid", monotonically_increasing_id())
      .join(rightU.select($"k".as("rk"), $"t".as("rt"), $"v".as("rv")),
        $"k" === $"rk" && $"t" < $"rt", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1 || $"rt".isNull)
      .select($"k", $"t", $"payload", $"rt".as("asof_t"), $"rv".as("asof_v"))
    assert(native.count() == 3000)
    assert(native.exceptAll(brute).isEmpty && brute.exceptAll(native).isEmpty)
  }

  test("leftJoinDefaults fills type defaults, not nulls (join_use_nulls=0)") {
    val left = Seq(1L, 2L, 3L).toDF("k")
    val right = Seq((1L, 5L, "x", 1.5)).toDF("k", "n", "s", "v")
    val got = Joins.leftJoinDefaults(left, right, Seq("k"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 5L, "x", 1.5), (2L, 0L, "", 0.0), (3L, 0L, "", 0.0)))
  }

  test("asofLeft picks the most recent right row at or before left time") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (1L, 20L, 300.0), (2L, 6L, 400.0))
      .toDF("k", "t", "v")
    val out = Joins.asofLeft(left, right, "k", "t", "t", Seq("t", "v"))
      .select($"tag", $"asof_t", $"asof_v").collect().map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out("l1") == ((Some(5L), Some(100.0))))   // 10 >= 5, not 15
    assert(out("l2") == ((Some(20L), Some(300.0))))  // inclusive match at 20
    assert(out("l3") == ((None, None)))              // right t=6 > left t=5
  }

  test("leftAny never fans out") {
    val left = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val right = Seq((1, "x"), (1, "y"), (1, "z")).toDF("k", "rv")
    val out = Joins.leftAny(left, right, Seq("k"), Seq(col("rv").asc))
    assert(out.count() == 2)
    assert(out.filter($"k" === 1).select("rv").as[String].head() == "x")
  }

  test("saltedJoin equals the plain join on a skewed fixture, for every supported type") {
    val rnd = new scala.util.Random(19)
    // 90% of left rows share one hot key
    val left = (1 to 4000).map(i =>
        (if (rnd.nextInt(10) < 9) 7L else rnd.nextInt(100).toLong, i))
      .toDF("k", "payload").repartition(11)
    val right = (0 until 80).map(k => (k.toLong, s"dim$k")).toDF("k", "v")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
        val salted = Joins.saltedJoin(left, right, Seq("k"), salts = 8, jt)
        val plain = left.join(right, Seq("k"), jt)
        assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
          s"mismatch for $jt")
      }
      // the hot key really is spread: its rows see several distinct salts
      val spread = left.filter($"k" === 7L)
        .withColumn("__salt",
          pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(8L)).cast("int"))
        .select(countDistinct($"__salt")).as[Long].head()
      assert(spread >= 6, s"hot key only spread over $spread salts")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("paste zips by rank; pasteLarge zips by position") {
    val a = Seq(10, 20, 30).toDF("x")
    val b = Seq("c", "b", "a").toDF("y")
    val p = Joins.paste(a, Seq(col("x").asc), b, Seq(col("y").asc))
    assert(p.count() == 3)
    assert(p.filter($"x" === 10).select("y").as[String].head() == "a")
    val pl = Joins.pasteLarge(a, b)
    assert(pl.count() == 3)
  }
}
