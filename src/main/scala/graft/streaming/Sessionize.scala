package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — the canonical CUSTOM-STATE streaming operator
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`): per-user event
  * streams split into sessions on a `gap` of inactivity, with event-time
  * timeouts flushing idle sessions once the watermark passes.
  *
  * [[sessionizeBatch]] is the batch twin (lag + running sum of
  * session-break flags — two window passes over one shuffle), used by the
  * oracle-checked registry query q52; the streaming form keeps O(1) state
  * per active user key, which is what survives an unbounded stream.
  */
object Sessionize {

  case class Event(user_id: Long, ts_s: Long, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Int, total: Double)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
                     n_events: Int, total: Double)

  /** Streaming sessionize over (user_id, ts_s seconds, value) rows.
    * Emits a session when a same-batch gap closes it or when the
    * event-time timeout fires (watermark > last event + gap).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_seconds(col("ts_s")))
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.lastTs, s.n, s.total))
          } else {
            val sorted = rows.map(r => (r._2, r._3)).toSeq.sortBy(_._1)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { case (t, v) =>
              cur = cur match {
                case Some(s) if t - s.lastTs <= gapSeconds =>
                  Some(SessionState(s.start, t, s.n + 1, s.total + v))
                case Some(s) =>
                  closed ::= Session(user, s.start, s.lastTs, s.n, s.total)
                  Some(SessionState(t, t, 1, v))
                case None => Some(SessionState(t, t, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastTs + gapSeconds) * 1000L + 1)
            }
            closed.reverse.iterator
          }
      }
  }

  /** Batch sessionization of the same semantics: session breaks where the
    * gap to the previous event exceeds `gapSeconds`; session id is the
    * running count of breaks. Both windows share one shuffle on user_id.
    */
  def sessionizeBatch(events: DataFrame, userCol: String, tsSecCol: String,
                      valueCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsSecCol))
    val newSess = when(
      col(tsSecCol) - lag(col(tsSecCol), 1).over(byUser) > gapSeconds ||
        lag(col(tsSecCol), 1).over(byUser).isNull, 1).otherwise(0)
    events
      .withColumn("__brk", newSess)
      .withColumn("__sid", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sid"))
      .agg(
        min(col(tsSecCol)).as("session_start"),
        max(col(tsSecCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total"))
      .drop("__sid")
  }
}
