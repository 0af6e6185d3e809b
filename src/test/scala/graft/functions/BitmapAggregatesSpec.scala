package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BitmapAggregatesSpec extends SparkSpec {
  import spark.implicits._
  import BitmapAggregates._

  test("serialize/deserialize roundtrip across sparse-array and dense-bitmap chunks") {
    val b: Buf = mutable.HashMap.empty
    // chunk 0: sparse (17 values) → ARRAY form; chunk 1: dense (5000) →
    // BITMAP form; chunk 40: boundary values
    val vals = (0 until 17).map(_ * 777L) ++
      (0 until 5000).map(i => (1L << 16) + i * 13 % 65536) ++
      Seq((40L << 16), (40L << 16) + 65535)
    val distinct = vals.distinct.sorted
    vals.foreach { v =>
      b.getOrElseUpdate((v >> 16).toInt, mutable.BitSet.empty) +=
        (v & 0xFFFF).toInt
    }
    val rt = deserialize(serialize(b))
    val back = rt.toSeq.sortBy(_._1).flatMap { case (hi, bits) =>
      bits.toSeq.sorted.map(lo => (hi.toLong << 16) | lo)
    }
    assert(back == distinct)
  }

  test("groupBitmap counts distinct exactly across partitions; state ops agree with sets") {
    val xs = (0 until 3000).map(i => (i * 7919L) % 100000L)
    val ys = (0 until 3000).map(i => (i * 104729L) % 100000L)
    val df = (xs.map(("x", _)) ++ ys.map(("y", _)))
      .toDF("g", "v").repartition(11)
    val st = df.groupBy($"g").agg(
      groupBitmapState($"v").as("bm"), groupBitmap($"v").as("card"))
    val m = st.collect().map(r =>
      r.getString(0) -> (r.getAs[Array[Byte]](1), r.getLong(2))).toMap
    val (sx, sy) = (xs.toSet, ys.toSet)
    assert(m("x")._2 == sx.size && m("y")._2 == sy.size)

    val two = st.agg(
      bitmapAndCardinality(min(when($"g" === "x", $"bm")),
        min(when($"g" === "y", $"bm"))).as("and"),
      bitmapOrCardinality(min(when($"g" === "x", $"bm")),
        min(when($"g" === "y", $"bm"))).as("or"),
      bitmapXorCardinality(min(when($"g" === "x", $"bm")),
        min(when($"g" === "y", $"bm"))).as("xor"),
      bitmapAndnotCardinality(min(when($"g" === "x", $"bm")),
        min(when($"g" === "y", $"bm"))).as("andnot")
    ).as[(Long, Long, Long, Long)].head()
    assert(two == ((sx & sy).size.toLong, (sx | sy).size.toLong,
      ((sx | sy) -- (sx & sy)).size.toLong, (sx -- sy).size.toLong))
  }

  test("bitmapContains and bitmapToArray") {
    val df = Seq(1L, 5L, 70000L, 70001L).toDF("v")
    val bm = df.agg(groupBitmapState($"v").as("bm"))
    val got = bm.select(
      bitmapContains($"bm", lit(5L)),
      bitmapContains($"bm", lit(6L)),
      bitmapToArray($"bm")).as[(Boolean, Boolean, Seq[Long])].head()
    assert(got._1 && !got._2)
    assert(got._3 == Seq(1L, 5L, 70000L, 70001L))
  }

  test("groupBitmapMergeState ORs persisted states (the -Merge combinator)") {
    val df = (0 until 100).map(i => (i % 4, i.toLong)).toDF("g", "v")
    val states = df.groupBy($"g").agg(groupBitmapState($"v").as("bm"))
    val merged = states.agg(
      bitmapCardinality(groupBitmapMergeState($"bm")).as("c"))
      .as[Long].head()
    assert(merged == 100L)
  }

  test("groupBitmap skips NULL inputs (CH/DuckDB aggregate semantics)") {
    val got = Seq(Some(1L), None, Some(2L), Some(1L), None).toDF("v")
      .agg(groupBitmap($"v")).as[Long].head()
    assert(got == 2L, s"got $got")
  }
}
