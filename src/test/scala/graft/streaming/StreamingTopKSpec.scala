package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("windowed SpaceSaving topK aggregates incrementally across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val events = input.toDF().toDF("ts_s", "v")
      .select(timestamp_seconds($"ts_s").as("ts"), $"v")
    val out = StreamingTopK.trendingTopK(events, "ts", "v",
      windowDur = "60 seconds", n = 2)
    val q = out.writeStream.format("memory")
      .queryName("t_trending").outputMode(OutputMode.Append()).start()
    try {
      // window [0, 60): "a" x3 across TWO batches (state-merge path),
      // "b" x2, "c" x1
      input.addData((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"))
      q.processAllAvailable()
      input.addData((5L, "a"), (6L, "b"))
      q.processAllAvailable()
      // advance the watermark past the window so it closes and emits
      input.addData((200L, "z"))
      q.processAllAvailable()

      val got = spark.table("t_trending")
        .select($"window_start".cast("long"), $"top_values", $"n_events")
        .as[(Long, Seq[String], Long)].collect()
      val w0 = got.find(_._1 == 0L).get
      assert(w0._2 == Seq("a", "b"), s"got $got")
      assert(w0._3 == 6L)
    } finally q.stop()
  }
}
