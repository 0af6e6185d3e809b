package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import Sessionize.{Event, Session}

  test("flatMapGroupsWithState sessionize: gap splits + event-time timeout flush") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessionize(input.toDS(), gapSeconds = 1800)
    val q = sessions.writeStream.format("memory")
      .queryName("t_sessions").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 has two events 5 min apart; user 2 one event
      input.addData(Event(1L, 1000L, 1.0), Event(1L, 1300L, 2.0),
        Event(2L, 1000L, 5.0))
      q.processAllAvailable()
      // batch 2: same-batch gap closes user 1's first session immediately;
      // the late timestamp also advances the watermark far past user 2
      input.addData(Event(1L, 50000L, 3.0))
      q.processAllAvailable()
      // batch 3: push the watermark further so timeouts for idle keys fire
      input.addData(Event(3L, 200000L, 7.0))
      q.processAllAvailable()

      val got = spark.table("t_sessions").as[Session].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total))
        .toSet
      assert(got.contains((1L, 1000L, 1300L, 2, 3.0)),  // split by in-batch gap
        s"missing user-1 first session in $got")
      assert(got.contains((2L, 1000L, 1000L, 1, 5.0)),  // flushed by timeout
        s"missing user-2 timed-out session in $got")
    } finally q.stop()
  }

  test("sessionizeBatch matches a hand-computed fixture") {
    val ev = Seq(
      (1L, 100L, 1.0), (1L, 200L, 2.0),     // session A (gap 100 <= 300)
      (1L, 1000L, 3.0),                     // session B (gap 800 > 300)
      (2L, 50L, 4.0))
      .toDF("user_id", "ts_s", "v")
    val got = Sessionize.sessionizeBatch(ev, "user_id", "ts_s", "v", 300L)
      .orderBy($"user_id", $"session_start")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 100L, 200L, 2L, 3.0),
      (1L, 1000L, 1000L, 1L, 3.0),
      (2L, 50L, 50L, 1L, 4.0)))
  }
}
