package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.functions.Funnels

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._
  import StreamingFunnel.{Ev, Level}

  // A->B->C funnel over bitmasked events, window 10
  private def mask(e: String): Int = e match {
    case "A" => 1; case "B" => 2; case "C" => 4; case _ => 0
  }

  test("streaming windowFunnel equals the batch aggregate when batches respect event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val levels = StreamingFunnel.windowFunnelStream(input.toDS(), window = 10L, nConds = 3)
    val q = levels.writeStream.format("memory")
      .queryName("t_funnel_lvls").outputMode(OutputMode.Update()).start()
    val all = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def feed(batch: (Long, Long, String)*): Unit = {
      all ++= batch
      input.addData(batch.map { case (u, t, e) => Ev(u, t, mask(e)) }: _*)
      q.processAllAvailable()
    }
    try {
      // user 1 completes across three batches; user 2 stalls at level 1
      // (B arrives outside the window of its chain start); user 3's
      // chain restarts when a later A gives more headroom
      feed((1L, 0L, "A"), (2L, 0L, "A"), (3L, 0L, "A"))
      feed((1L, 3L, "B"), (2L, 20L, "B"), (3L, 8L, "B"), (3L, 9L, "A"))
      feed((1L, 7L, "C"), (2L, 21L, "A"), (3L, 12L, "B"), (3L, 15L, "C"))

      // last Update-mode row per user = current level
      val got = spark.table("t_funnel_lvls")
        .groupBy($"user_id").agg(max($"level").as("level"))
        .as[(Long, Int)].collect().toMap

      // batch twin over the SAME events
      val batch = all.toSeq.toDF("uid", "t", "e")
        .groupBy($"uid")
        .agg(Funnels.windowFunnel(10L, $"t",
          Seq($"e" === "A", $"e" === "B", $"e" === "C")).as("lvl"))
        .as[(Long, Int)].collect().toMap

      assert(got == batch, s"stream $got != batch $batch")
      assert(got(1L) == 3 && got(2L) == 1 && got(3L) == 3)
    } finally q.stop()
  }

  test("state stays O(nConds): a flood of events leaves one fixed-size state row per user") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val levels = StreamingFunnel.windowFunnelStream(input.toDS(), window = 5L, nConds = 2)
    val q = levels.writeStream.format("memory")
      .queryName("t_funnel_flood").outputMode(OutputMode.Update()).start()
    try {
      // 10k never-completing A events for one user: state must not grow
      input.addData((0 until 10000).map(i => Ev(9L, i.toLong * 100, 1)): _*)
      q.processAllAvailable()
      val prog = q.lastProgress
      val rows = prog.stateOperators.head.numRowsTotal
      assert(rows == 1L, s"expected 1 state row, got $rows")
      val lvl = spark.table("t_funnel_flood")
        .groupBy($"user_id").agg(max($"level")).as[(Long, Int)].collect().toMap
      assert(lvl(9L) == 1)
    } finally q.stop()
  }
}
