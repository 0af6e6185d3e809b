package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One event flowing into a sequence aggregate: epoch-second timestamp
  * plus the bitmask of pattern conditions the row matched (bit i set =
  * condition i true). Rows matching no condition are dropped in `reduce`,
  * so per-key state is bounded by the key's MATCHING events — the same
  * buffering model ClickHouse's windowFunnel/sequenceMatch states use.
  */
case class FunnelEvent(t: Long, m: Int)

/** Growable event buffer: parallel primitive arrays with doubling,
  * mutated in place on the reduce path (ObjectHashAggregate keeps the
  * object buffer live between rows; encoding happens only at partial
  * exchange).
  */
case class EvBuf(var n: Int, var ts: Array[Long], var ms: Array[Int])

object EventSeqAggregator {
  /** Hard bound on MATCHING events buffered per key (~4.2M events =
    * ~50 MB of primitive arrays). The 100 TB failure mode for
    * event-buffer aggregates is a hot key growing state without bound;
    * past this the aggregate fails crisply with a pre-filter hint
    * instead of slowly strangling an executor — the same guardrail
    * ClickHouse's sequence states apply (its sequenceMatch/windowFunnel
    * states cap buffered events and error beyond the limit).
    */
  val MaxEventsPerKey: Int = 1 << 22
}

abstract class EventSeqAggregator[OUT](nConds: Int)
    extends Aggregator[FunnelEvent, EvBuf, OUT] {
  require(nConds >= 1 && nConds <= 32, "1..32 conditions")

  /** Overridable per-key event bound (tests shrink it; see companion). */
  protected def maxEvents: Int = EventSeqAggregator.MaxEventsPerKey

  private def overflow(n: Long): Nothing =
    throw new IllegalStateException(
      s"sequence aggregate buffered $n matching events for one key " +
        s"(limit $maxEvents, ~${maxEvents.toLong * 12 / (1 << 20)} MB); " +
        "pre-filter the events (time range or tighter conditions) or " +
        "split the key before aggregating")

  final override def zero: EvBuf =
    EvBuf(0, Array.emptyLongArray, Array.emptyIntArray)

  final override def reduce(b: EvBuf, e: FunnelEvent): EvBuf = {
    if (e.m == 0) return b // matches no condition: never relevant
    if (b.n >= maxEvents) overflow(b.n.toLong + 1)
    if (b.n == b.ts.length) {
      val cap = math.max(8, math.min(b.ts.length * 2, maxEvents))
      b.ts = java.util.Arrays.copyOf(b.ts, cap)
      b.ms = java.util.Arrays.copyOf(b.ms, cap)
    }
    b.ts(b.n) = e.t; b.ms(b.n) = e.m; b.n += 1
    b
  }

  final override def merge(a: EvBuf, b: EvBuf): EvBuf = {
    if (b.n == 0) return a
    if (a.n == 0) return b
    val n = a.n + b.n
    if (n > maxEvents) overflow(n.toLong)
    val ts = java.util.Arrays.copyOf(a.ts, n)
    val ms = java.util.Arrays.copyOf(a.ms, n)
    System.arraycopy(b.ts, 0, ts, a.n, b.n)
    System.arraycopy(b.ms, 0, ms, a.n, b.n)
    EvBuf(n, ts, ms)
  }

  /** Events sorted by (ts, mask) — a deterministic total order, matching
    * the (timestamp, event-index) sort ClickHouse applies before its scan.
    */
  protected final def sorted(b: EvBuf): Array[(Long, Int)] = {
    val out = new Array[(Long, Int)](b.n)
    var i = 0
    while (i < b.n) { out(i) = (b.ts(i), b.ms(i)); i += 1 }
    java.util.Arrays.sort(out, (x: (Long, Int), y: (Long, Int)) => {
      val c = java.lang.Long.compare(x._1, y._1)
      if (c != 0) c else Integer.compare(x._2, y._2)
    })
    out
  }

  final override def bufferEncoder = Encoders.product[EvBuf]
}

/** windowFunnel(window)(ts, cond1..condN): the max funnel level reached —
  * the longest chain e1..ek with e_i matching cond_i, timestamps
  * non-decreasing in (ts, cond-index) order, and every chain event within
  * `window` seconds of the chain's FIRST event. Single sorted scan with
  * O(nConds) chain state; a new cond1 event restarts the chain window
  * (later start = more headroom, never worse — so the greedy scan equals
  * the exists-a-chain semantics the oracle SQL checks).
  *
  * `strictIncrease` is ClickHouse's strict_increase mode: consecutive
  * chain events need strictly increasing timestamps.
  */
class WindowFunnelAggregator(window: Long, nConds: Int,
                             strictIncrease: Boolean = false)
    extends EventSeqAggregator[Int](nConds) {

  override def finish(b: EvBuf): Int = {
    // expand multi-condition events: one (ts, condIdx) entry per set bit,
    // scanned in (ts, condIdx) order
    var cnt = 0
    var i = 0
    while (i < b.n) { cnt += Integer.bitCount(b.ms(i)); i += 1 }
    val ts = new Array[Long](cnt)
    val ix = new Array[Int](cnt)
    var o = 0
    i = 0
    while (i < b.n) {
      var m = b.ms(i)
      while (m != 0) {
        val bit = Integer.numberOfTrailingZeros(m)
        ts(o) = b.ts(i); ix(o) = bit; o += 1
        m &= m - 1
      }
      i += 1
    }
    // sort by (ts, condIdx)
    val order = (0 until cnt).sortBy(j => (ts(j), ix(j)))

    val NO = Long.MinValue
    val first = Array.fill(nConds)(NO) // chain-start ts per reached level
    val cur = Array.fill(nConds)(NO)   // ts of the event that reached it
    var best = 0
    for (j <- order) {
      val t = ts(j); val idx = ix(j)
      if (idx == 0) {
        first(0) = t; cur(0) = t
        if (best < 1) best = 1
      } else if (first(idx - 1) != NO && t - first(idx - 1) <= window &&
                 (!strictIncrease || t > cur(idx - 1))) {
        first(idx) = first(idx - 1); cur(idx) = t
        if (best < idx + 1) best = idx + 1
        if (best == nConds) return best
      }
    }
    best
  }
  override def outputEncoder = Encoders.scalaInt
}

/** One step of a sequenceMatch pattern: the condition to match, whether a
  * gap (`.*`) is allowed before it, and an optional adjacent-step time
  * constraint `(?t op seconds)`.
  */
private[functions] case class SeqStep(cond: Int, gapBefore: Boolean,
                                      tcOp: String, tcVal: Long)

private[functions] object SeqPattern {
  private val StepRe = raw"\(\?(\d+)\)".r
  private val TimeRe = raw"\(\?t\s*(<=|>=|<|>)\s*(\d+)\)".r

  /** Parses the ClickHouse sequenceMatch pattern subset `(?N)`, `.*`, and
    * `(?t op seconds)` with op in <, <=, >, >= (one per gap). The leading
    * gap is implicit (a match may start anywhere in the sequence).
    */
  def parse(pattern: String, nConds: Int): Array[SeqStep] = {
    val steps = scala.collection.mutable.ArrayBuffer.empty[SeqStep]
    var gap = steps.isEmpty // implicit leading .*
    var tcOp: String = null
    var tcVal = 0L
    var rest = pattern.trim
    while (rest.nonEmpty) {
      rest match {
        case s if s.startsWith(".*") =>
          gap = true; rest = s.drop(2)
        case s =>
          TimeRe.findPrefixMatchOf(s) match {
            case Some(m) =>
              require(tcOp == null, s"one (?t..) per gap: $pattern")
              require(steps.nonEmpty, s"(?t..) cannot open a pattern: $pattern")
              tcOp = m.group(1); tcVal = m.group(2).toLong
              rest = s.drop(m.end)
            case None =>
              StepRe.findPrefixMatchOf(s) match {
                case Some(m) =>
                  val c = m.group(1).toInt - 1
                  require(c >= 0 && c < nConds,
                    s"(?${c + 1}) out of range, $nConds conditions")
                  steps += SeqStep(c, gapBefore = gap || steps.isEmpty,
                    tcOp = tcOp, tcVal = tcVal)
                  gap = false; tcOp = null; tcVal = 0L
                  rest = s.drop(m.end)
                case None =>
                  throw new IllegalArgumentException(
                    s"unsupported pattern at '...$s'")
              }
          }
      }
    }
    require(tcOp == null, s"dangling (?t..): $pattern")
    require(steps.nonEmpty, s"empty pattern: $pattern")
    steps.toArray
  }
}

/** NFA over the per-key MATCHING-event sequence (events matching no
  * condition are skipped, per the reference's documented semantics; an
  * adjacent `(?1)(?2)` therefore means "the next matching event", while
  * `(?1).*(?2)` allows any gap). State per pattern prefix = alive flag +
  * the [earliest, latest] timestamp of the event that completed the
  * prefix; time constraints bind consecutive steps only, so the interval
  * extremes decide one-sided `(?t op v)` feasibility exactly.
  */
private[functions] abstract class SequenceNfaAggregator[OUT](
    pattern: String, nConds: Int)
    extends EventSeqAggregator[OUT](nConds) {

  protected val steps: Array[SeqStep] = SeqPattern.parse(pattern, nConds)
  private val P = steps.length

  /** Runs the NFA; returns the count of non-overlapping completions (the
    * NFA resets after each completion — greedy-earliest matching).
    */
  protected final def scan(b: EvBuf, stopAtFirst: Boolean): Long = {
    val evs = sorted(b)
    val alive = new Array[Boolean](P + 1)
    val lo = new Array[Long](P + 1)
    val hi = new Array[Long](P + 1)
    val created = new Array[Boolean](P + 1)
    alive(0) = true
    var count = 0L

    def timeOk(p: Int, t: Long): Boolean = {
      val st = steps(p)
      if (st.tcOp == null || p == 0) true
      else st.tcOp match {
        case "<=" => t - hi(p) <= st.tcVal
        case "<"  => t - hi(p) < st.tcVal
        case ">=" => t - lo(p) >= st.tcVal
        case ">"  => t - lo(p) > st.tcVal
      }
    }

    var e = 0
    while (e < evs.length) {
      val (t, m) = evs(e)
      java.util.Arrays.fill(created, false)
      var completed = false
      var p = P - 1
      while (p >= 0 && !completed) {
        if (alive(p) && (m & (1 << steps(p).cond)) != 0 && timeOk(p, t)) {
          if (p + 1 == P) {
            count += 1
            if (stopAtFirst) return count
            // non-overlapping: restart fresh after the completing event
            java.util.Arrays.fill(alive, false)
            alive(0) = true
            completed = true
          } else {
            // an alive no-gap state is dying THIS event (adjacency) —
            // a re-creation must REPLACE its extremes, not merge with
            // the stale chain's timestamps
            val merge = alive(p + 1) &&
              (steps(p + 1).gapBefore || created(p + 1))
            if (!merge) { lo(p + 1) = t; hi(p + 1) = t }
            else {
              if (t < lo(p + 1)) lo(p + 1) = t
              if (t > hi(p + 1)) hi(p + 1) = t
            }
            alive(p + 1) = true; created(p + 1) = true
          }
        }
        p -= 1
      }
      if (!completed) {
        // adjacency: a prefix awaiting a no-gap step survives only the
        // event that just created it
        p = 1
        while (p < P) {
          if (alive(p) && !created(p) && !steps(p).gapBefore) alive(p) = false
          p += 1
        }
      }
      e += 1
    }
    count
  }
}

class SequenceMatchAggregator(pattern: String, nConds: Int)
    extends SequenceNfaAggregator[Boolean](pattern, nConds) {
  override def finish(b: EvBuf): Boolean = scan(b, stopAtFirst = true) > 0
  override def outputEncoder = Encoders.scalaBoolean
}

class SequenceCountAggregator(pattern: String, nConds: Int)
    extends SequenceNfaAggregator[Long](pattern, nConds) {
  override def finish(b: EvBuf): Long = scan(b, stopAtFirst = false)
  override def outputEncoder = Encoders.scalaLong
}

/** The reference's parametric sequence aggregates (SURVEY.md §2.4;
  * ClickHouse's windowFunnel / retention / sequenceMatch / sequenceCount
  * family) as partial-aggregatable Spark Aggregators. Per-key state is
  * the key's matching events only — merge is buffer concatenation, so
  * map-side combine applies and no window-per-key reducer shape appears;
  * the sorted scan happens once per key at finalization, exactly
  * ClickHouse's aggregate-state model.
  *
  * Timestamps are epoch seconds (pass `unix_timestamp(ts)`); conditions
  * are boolean columns evaluated per row.
  */
object Funnels {

  private def mask(conds: Seq[Column]): Column =
    conds.zipWithIndex
      .map { case (c, i) =>
        when(c, lit(1 << i)).otherwise(lit(0))
      }
      .reduce(_.bitwiseOR(_))

  // null-safe UDAF inputs: a null timestamp contributes mask 0, which
  // `reduce` drops before touching the time
  private def args(ts: Column, conds: Seq[Column]): (Column, Column) =
    (coalesce(ts.cast("long"), lit(0L)),
      when(ts.isNull, lit(0)).otherwise(mask(conds)))

  /** windowFunnel(window)(ts, cond1, ..): max consecutive funnel level
    * reached within `window` seconds of the chain's first event.
    */
  def windowFunnel(window: Long, ts: Column, conds: Seq[Column],
                   strictIncrease: Boolean = false): Column = {
    val (t, m) = args(ts, conds)
    udaf(new WindowFunnelAggregator(window, conds.length, strictIncrease),
      Encoders.product[FunnelEvent]).apply(t, m)
  }

  /** retention(cond1, ..): array of 0/1 flags — r(0)=cond1 ever held;
    * r(i)=cond1 AND cond_{i+1} both ever held. Pure column composition
    * (one hash aggregation, no buffering).
    */
  def retention(conds: Seq[Column]): Column = {
    val anchor = max(conds.head.cast("int"))
    array(anchor +: conds.tail.map(c => least(anchor, max(c.cast("int")))): _*)
  }

  /** sequenceMatch(pattern)(ts, cond1, ..): true if the key's event
    * sequence contains the pattern. Supported pattern syntax: `(?N)`,
    * `.*`, `(?t op seconds)` with op <, <=, >, >=.
    */
  def sequenceMatch(pattern: String, ts: Column, conds: Seq[Column]): Column = {
    val (t, m) = args(ts, conds)
    udaf(new SequenceMatchAggregator(pattern, conds.length),
      Encoders.product[FunnelEvent]).apply(t, m)
  }

  /** sequenceCount(pattern)(ts, cond1, ..): number of non-overlapping
    * pattern matches (the NFA restarts after each completion).
    */
  def sequenceCount(pattern: String, ts: Column, conds: Seq[Column]): Column = {
    val (t, m) = args(ts, conds)
    udaf(new SequenceCountAggregator(pattern, conds.length),
      Encoders.product[FunnelEvent]).apply(t, m)
  }

  /** sequenceNextNode('forward', 'first_match')(order, event, cond1..n):
    * per key, the event VALUE right after the first CONSECUTIVE run of
    * events matching cond1..condN in the explicit `order` (CH's
    * insertion order, pinned by sort keys as elsewhere). NULL when the
    * chain ends the stream; keys with no chain emit no row.
    *
    * Spark spelling — no custom aggregate: cond_i is checked on the
    * i-th lead inside ONE ordered window, the first match is a
    * partition-min over the same partitioning (Exchange reused, so the
    * whole operator is a single shuffle on the key).
    */
  def sequenceNextNode(df: org.apache.spark.sql.DataFrame, keyCol: String,
                       order: Seq[Column], event: Column,
                       conds: Seq[Column]): org.apache.spark.sql.DataFrame = {
    require(conds.nonEmpty, "sequenceNextNode needs at least one condition")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
    val chainOk = conds.zipWithIndex.map { case (c, i) =>
      if (i == 0) c else lead(c, i).over(w)
    }.reduce(_ && _)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__nxt", lead(event, conds.length).over(w))
      .withColumn("__ok", chainOk)
      .withColumn("__rn0", min(when(col("__ok"), col("__rn"))).over(wAll))
      .filter(col("__rn") === col("__rn0"))
      .select(col(keyCol), col("__nxt").as("next_node"))
  }
}
