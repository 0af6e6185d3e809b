package graft.functions

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hot-key stress for the event-buffer sequence aggregates: the 100 TB
  * failure mode is one key accumulating unbounded state. Verifies (a) a
  * multi-million-event key completes with the right answer, (b) the
  * ObjectHashAggregate sort-based fallback path (triggered on many
  * groups) round-trips EvBuf buffers through serialization correctly,
  * and (c) past the documented per-key cap the aggregate fails crisply
  * with a pre-filter hint instead of strangling the executor.
  */
class FunnelStressSpec extends SparkSpec {
  import spark.implicits._

  test("windowFunnel survives a 3M-event hot key") {
    // one key, events at t = id with type cycling A,B,C: a full A→B→C
    // chain exists inside any 10-second window
    val df = spark.range(3000000L).select(
      lit(0L).as("uid"), col("id").as("t"),
      element_at(array(lit("A"), lit("B"), lit("C")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("e"))
    val lvl = df.groupBy($"uid")
      .agg(Funnels.windowFunnel(10L, $"t",
        Seq($"e" === "A", $"e" === "B", $"e" === "C")).as("lvl"))
      .select($"lvl").as[Int].head()
    assert(lvl == 3)
  }

  test("sort-based ObjectHashAggregate fallback preserves funnel state") {
    val conf = spark.conf
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = conf.get(key)
    try {
      conf.set(key, "64") // force fallback well before 10k groups
      // every key gets A@0, B@5 (in window) and C@100 (outside): level 2
      val df = spark.range(10000L).flatMap { k =>
        Seq((k, 0L, "A"), (k, 5L, "B"), (k, 100L, "C"))
      }.toDF("uid", "t", "e")
      val levels = df.groupBy($"uid")
        .agg(Funnels.windowFunnel(10L, $"t",
          Seq($"e" === "A", $"e" === "B", $"e" === "C")).as("lvl"))
        .groupBy($"lvl").count()
        .as[(Int, Long)].collect().toMap
      assert(levels == Map(2 -> 10000L))
    } finally conf.set(key, prev)
  }

  test("per-key event cap fails crisply with a pre-filter hint") {
    val capped = new WindowFunnelAggregator(10L, 1) {
      override protected def maxEvents: Int = 100
    }
    val agg = F.udaf(capped, Encoders.product[FunnelEvent])
    val df = spark.range(200L)
      .select(lit(0L).as("uid"), col("id").as("t"), lit(1).as("m"))
    val ex = intercept[Exception] {
      df.groupBy($"uid").agg(agg($"t", $"m").as("lvl")).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    val hit = chain(ex).exists(t =>
      t.isInstanceOf[IllegalStateException] &&
        t.getMessage.contains("pre-filter"))
    assert(hit, s"expected the cap's IllegalStateException, got: $ex")
  }

  test("default cap admits full-scale keys (documented bound)") {
    assert(EventSeqAggregator.MaxEventsPerKey == (1 << 22))
  }
}
