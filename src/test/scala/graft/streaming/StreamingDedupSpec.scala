package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming near-dup filter: cross-batch dedup through the store") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the rain in spain stays mainly on the plain every single day"
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupFilterStream(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text",
      storePath = s"$root/store", outputPath = s"$root/out",
      checkpoint = s"$root/ckpt")
    try {
      mem.addData((1L, base),
        (2L, base.replace("lazy", "sleepy")), // near-dup of 1, same batch
        (3L, "completely unrelated content about distributed query " +
          "engines and columnar storage formats with vectorized pipelines"))
      q.processAllAvailable()
      mem.addData(
        (10L, base.replace("quick", "rapid")), // near-dup across batches
        (11L, "a genuinely novel paragraph describing materialized views " +
          "and incremental maintenance of aggregates under inserts"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$root/out")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L, 11L))
    } finally q.stop()
  }
}
