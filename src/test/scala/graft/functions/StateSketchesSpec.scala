package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import StateSketches._

class StateSketchesSpec extends SparkSpec {
  import spark.implicits._

  test("avgState/avgMerge over partitions equals the direct average") {
    val df = (1 to 1000).map(i => (i % 7, i * 0.25)).toDF("g", "v")
    val states = df.groupBy($"g", (col("v") * 10).cast("int").as("sub"))
      .agg(avgState($"v").as("st"))
    val merged = states.groupBy($"g").agg(avgMerge($"st").as("avg_v"))
    val direct = df.groupBy($"g").agg(
      (sum((col("v") * 100).cast("long")).cast("double") / 100.0 / count(lit(1))).as("avg_v"))
    val m = merged.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    direct.collect().foreach(r => assert(math.abs(m(r.getInt(0)) - r.getDouble(1)) < 1e-12))
  }

  test("HLL merge of partial states equals the state of the union") {
    val a = new Array[Byte](Hll.M)
    val b = new Array[Byte](Hll.M)
    val all = new Array[Byte](Hll.M)
    (1 to 5000).foreach { i => Hll.add(a, s"x$i"); Hll.add(all, s"x$i") }
    (3000 to 8000).foreach { i => Hll.add(b, s"x$i"); Hll.add(all, s"x$i") }
    Hll.mergeInto(a, b)
    assert(a.sameElements(all))
    val est = Hll.estimate(all)
    assert(math.abs(est - 8000.0) / 8000.0 < 0.05, s"estimate $est")
  }

  test("uniqState/uniqMerge through DataFrames is within HLL error") {
    val df = (1 to 20000).map(i => (i % 4, s"u${i % 3000}")).toDF("g", "u")
    val states = df.groupBy($"g", (length($"u") % 3).as("sub"))
      .agg(uniqState($"u").as("st"))
    val merged = states.groupBy($"g").agg(uniqMerge($"st").as("uniq"))
    merged.collect().foreach { r =>
      val est = r.getLong(1)
      val exact = 3000.0 / 4  // each g sees 750 distinct users
      assert(math.abs(est - exact) / exact < 0.08, s"g=${r.get(0)} est=$est")
    }
  }

  test("quantileState/quantileMerge: rank error bounded under any merge order") {
    // 10k values 0..9999 split into 8 per-partition states, merged back
    val vals = (0 until 10000).map(i => ((i % 8).toLong, i.toDouble))
      .toDF("part", "v")
    val states = vals.groupBy($"part").agg(quantileState($"v").as("st"))
    // states survive a binary round-trip (the persistable-column contract)
    val roundTrip = states.select($"part", $"st").collect()
    assert(roundTrip.forall(_.getAs[Array[Byte]](1).length > 20))
    for (q <- Seq(0.1, 0.5, 0.99)) {
      val got = states.agg(quantileMerge(q)($"st")).as[Double].head()
      val exactRank = q * 9999
      // GK guarantees |rank(got) - q*n| <= relErr*n; values==ranks here
      assert(math.abs(got - exactRank) <= 0.01 * 10000 + 1,
        s"q=$q got=$got want~$exactRank")
    }
    // merge-of-states equals a single-state query within the same bound
    val one = vals.agg(quantileState($"v").as("st"))
      .agg(quantileMerge(0.5)($"st")).as[Double].head()
    assert(math.abs(one - 4999.5) <= 101)
    // empty input -> NaN
    val empty = vals.filter($"v" < 0)
      .agg(quantileState($"v").as("st"))
      .agg(quantileMerge(0.5)($"st")).as[Double].head()
    assert(empty.isNaN)
  }

  test("quantileState skips NULL inputs (CH/DuckDB aggregate semantics)") {
    val got = Seq(Some(1.0), None, Some(2.0), None, Some(3.0)).toDF("v")
      .agg(quantileState($"v").as("st"))
      .agg(quantileMerge(0.5)($"st")).as[Double].head()
    assert(got == 2.0, s"got $got")
  }

  test("sumLongState skips NULL inputs (CH/DuckDB aggregate semantics)") {
    val got = Seq(Some(5L), None, Some(7L), None).toDF("v")
      .agg(StateSketches.sumLongState($"v").as("s")).as[Long].head()
    assert(got == 12L)
  }
}
