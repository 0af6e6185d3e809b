package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming windowFunnel — the incremental twin of
  * [[graft.functions.WindowFunnelAggregator]] (q54). The batch
  * aggregate's chain scan is a single left-to-right pass with O(nConds)
  * state (chain-start and chain-reach timestamps per level + best), so
  * the SAME state carries across micro-batches: per user key the stream
  * holds two fixed-size arrays, never an event buffer — the state that
  * survives an unbounded stream, and the streaming answer equals the
  * batch aggregate whenever events arrive in event-time order across
  * batches (within a batch any order is fine — entries are expanded and
  * sorted exactly like the batch scan). Late events beyond a chain
  * already superseded can only under-report, never corrupt state.
  */
object StreamingFunnel {

  /** One event: pre-computed condition bitmask (bit i = condition i). */
  case class Ev(user_id: Long, ts_s: Long, mask: Int)
  case class ChainState(first: Seq[Long], cur: Seq[Long], best: Int)
  case class Level(user_id: Long, level: Int)

  private val NO = Long.MinValue

  /** Update-mode funnel levels: one (user, best-level-so-far) row per
    * user per micro-batch that touches it.
    */
  def windowFunnelStream(events: Dataset[Ev], window: Long, nConds: Int,
                         strictIncrease: Boolean = false): Dataset[Level] = {
    import events.sparkSession.implicits._
    require(nConds >= 1 && nConds <= 32, "1..32 conditions")
    events.groupByKey(_.user_id)
      .mapGroupsWithState[ChainState, Level](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state) =>
          val s0 = state.getOption.getOrElse(
            ChainState(Seq.fill(nConds)(NO), Seq.fill(nConds)(NO), 0))
          val first = s0.first.toArray
          val cur = s0.cur.toArray
          var best = s0.best
          // expand multi-condition events to (ts, condIdx) entries and
          // sort — the exact order the batch aggregate scans in
          val entries = rows.flatMap { e =>
            var m = e.mask
            var out = List.empty[(Long, Int)]
            while (m != 0) {
              val b = Integer.numberOfTrailingZeros(m)
              out ::= (e.ts_s, b)
              m &= m - 1
            }
            out
          }.toArray
          java.util.Arrays.sort(entries, (x: (Long, Int), y: (Long, Int)) => {
            val c = java.lang.Long.compare(x._1, y._1)
            if (c != 0) c else Integer.compare(x._2, y._2)
          })
          entries.foreach { case (t, idx) =>
            if (idx == 0) {
              first(0) = t; cur(0) = t
              if (best < 1) best = 1
            } else if (first(idx - 1) != NO && t - first(idx - 1) <= window &&
                       (!strictIncrease || t > cur(idx - 1))) {
              first(idx) = first(idx - 1); cur(idx) = t
              if (best < idx + 1) best = idx + 1
            }
          }
          state.update(ChainState(first.toSeq, cur.toSeq, best))
          Level(user, best)
      }
  }
}
