package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  private val good1 = "the quick brown fox and the lazy dog in the garden"
  private val good2 = "it is a truth universally acknowledged that a reader wants prose"
  private val junk = "zz 9 9 9 9 9 9 9 1 2 3 4 5 6 7 8"

  private def writeBatch(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "ts", "text")
      .select($"doc_id", $"ts".cast(TimestampType).as("ts"), $"text")
      .coalesce(1).write.mode("append").parquet(dir)

  test("stream-stream interval join matches clicks to impressions within the delay bound") {
    val root = Files.createTempDirectory("graft_ssj").toString
    val impSchema = StructType(Seq(
      StructField("ad_id", LongType), StructField("imp_ts", TimestampType)))
    val clkSchema = StructType(Seq(
      StructField("ad_id", LongType), StructField("clk_ts", TimestampType)))
    def write(dir: String, rows: Seq[(Long, String)], ts: String): Unit =
      rows.toDF("ad_id", ts)
        .select($"ad_id", col(ts).cast(TimestampType).as(ts))
        .coalesce(1).write.mode("append").parquet(dir)
    write(s"$root/imp", Seq(
      (1L, "2026-01-01 10:00:00"),
      (2L, "2026-01-01 10:00:00"),
      (3L, "2026-01-01 10:00:00")), "imp_ts")
    write(s"$root/clk", Seq(
      (1L, "2026-01-01 10:00:30"),   // within 1 minute  -> joins
      (2L, "2026-01-01 10:05:00"),   // beyond the delay -> no join
      (4L, "2026-01-01 10:00:10")), "clk_ts") // no impression -> no join
    val imp = spark.readStream.schema(impSchema).parquet(s"$root/imp")
    val clk = spark.readStream.schema(clkSchema).parquet(s"$root/clk")
    val joined = StreamingPipeline.joinWithinInterval(
      imp, clk, "ad_id", "imp_ts", "clk_ts",
      watermark = "2 minutes", maxDelay = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ssj_sink").select($"ad_id").as[Long].collect().toSeq
    assert(got == Seq(1L), s"joined ads: $got")
  }

  test("streaming curation gates quality and dedups content within the watermark") {
    val root = Files.createTempDirectory("graft_cur").toString
    val srcDir = s"$root/src"
    writeBatch(srcDir, Seq(
      (1L, "2026-01-01 10:00:00", good1),
      (2L, "2026-01-01 10:00:05", junk),   // quality-gated out
      (3L, "2026-01-01 10:00:10", good1))) // duplicate content of 1

    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val curated = StreamingPipeline.curated(stream, "text", "ts",
      watermark = "10 minutes", minQuality = 0.3, langs = Seq("en"))
    val q = curated.writeStream.format("memory").queryName("curated_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second micro-batch: another copy of good1 (still inside the
      // watermark horizon -> dropped) and a fresh good doc (kept)
      writeBatch(srcDir, Seq(
        (4L, "2026-01-01 10:01:00", good1),
        (5L, "2026-01-01 10:01:05", good2)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("curated_sink")
      .select($"doc_id", $"lang", $"quality", $"fingerprint")
      .collect()
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids == Set(1L, 5L), s"survivors: $ids")
    assert(rows.forall(_.getString(1) == "en"))
    assert(rows.forall(_.getDouble(2) >= 0.3))
    // the fingerprints of the two survivors differ (distinct content)
    assert(rows.map(_.getString(3)).distinct.length == 2)
  }
}
