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
}
