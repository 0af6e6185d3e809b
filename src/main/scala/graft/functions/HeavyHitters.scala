package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.StringType

/** ClickHouse's `topK(N)(x)` / `topKWeighted(N)(x, w)` approximate
  * most-frequent-values aggregates (the reference's parametric two-parens
  * aggregate family, `lectures/lecture_06.md:57-59`; SURVEY §2.4),
  * implemented as the SpaceSaving summary (Metwally et al. 2005) behind a
  * partial-aggregatable Spark `Aggregator`, with the provable distributed
  * merge from Agarwal et al., "Mergeable Summaries".
  *
  * The summary keeps at most `cap = N × loadFactor` counters (ClickHouse
  * reserves the same 3× by default). Eviction charges the new value the
  * evicted minimum as `err`, preserving SpaceSaving's guarantee: any value
  * with true frequency > total/cap is present in the summary. When `cap`
  * exceeds the column's distinct count no eviction can occur and the
  * result is EXACT with deterministic (count desc, value asc) order —
  * which is what makes q58's oracle row checkable; approximation behavior
  * under pressure is spec-asserted instead.
  *
  * Scale shape: state is O(cap) per group on every map side; merges are
  * counter-map unions trimmed back to `cap` — the same partial/final
  * shape as every built-in aggregate, no window, no per-group reducer
  * funnel.
  */
object HeavyHitters {

  final class Counter(var count: Long, var err: Long) extends Serializable

  type Buf = mutable.HashMap[String, Counter]

  private def trimmed(b: Buf, cap: Int): Buf =
    if (b.size <= cap) b
    else {
      val nb: Buf = mutable.HashMap.empty
      b.toSeq.sortBy { case (k, c) => (-c.count, k) }.take(cap)
        .foreach { case (k, c) => nb(k) = c }
      nb
    }

  private def insert(b: Buf, v: String, w: Long, cap: Int): Buf = {
    if (v == null || w <= 0) return b
    b.get(v) match {
      case Some(c) => c.count += w
      case None if b.size < cap => b(v) = new Counter(w, 0)
      case None =>
        // evict the (deterministically chosen) minimum counter; the
        // newcomer inherits its count as the overestimation error
        val (mk, mc) = b.minBy { case (k, c) => (c.count, k) }
        b.remove(mk)
        b(v) = new Counter(mc.count + w, mc.count)
    }
    b
  }

  /** The PROVABLE summary merge (Agarwal et al., "Mergeable Summaries"):
    * a key absent from a summary that has reached capacity may have been
    * evicted with count up to that summary's minimum counter, so the
    * merge charges absentees exactly that minimum (as count AND error).
    * This preserves the SpaceSaving invariant — true_count <= count <=
    * true_count + err — across arbitrary distributed merge trees. When a
    * summary never filled (no eviction possible), absence really means
    * zero and counts stay exact.
    */
  private def mergeBufs(b1: Buf, b2: Buf, cap: Int): Buf = {
    val m1 = if (b1.size >= cap) b1.valuesIterator.map(_.count).min else 0L
    val m2 = if (b2.size >= cap) b2.valuesIterator.map(_.count).min else 0L
    val out: Buf = mutable.HashMap.empty
    (b1.keysIterator ++ b2.keysIterator).foreach { k =>
      if (!out.contains(k)) {
        val (c1, e1) = b1.get(k).map(c => (c.count, c.err)).getOrElse((m1, m1))
        val (c2, e2) = b2.get(k).map(c => (c.count, c.err)).getOrElse((m2, m2))
        out(k) = new Counter(c1 + c2, e1 + e2)
      }
    }
    trimmed(out, cap)
  }

  private def top(b: Buf, n: Int): Seq[String] =
    b.toSeq.sortBy { case (k, c) => (-c.count, k) }.take(n).map(_._1)

  class TopKFreqAggregator(n: Int, cap: Int)
      extends Aggregator[String, Buf, Seq[String]] {
    override def zero: Buf = mutable.HashMap.empty
    override def reduce(b: Buf, v: String): Buf = insert(b, v, 1L, cap)
    override def merge(b1: Buf, b2: Buf): Buf = mergeBufs(b1, b2, cap)
    override def finish(b: Buf): Seq[String] = top(b, n)
    override def bufferEncoder = Encoders.kryo[Buf]
    override def outputEncoder = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[String]]()
  }

  /** One weighted observation; `v` null or `w <= 0` is skipped. */
  final case class Weighted(v: String, w: Long)

  class TopKWeightedAggregator(n: Int, cap: Int)
      extends Aggregator[Weighted, Buf, Seq[String]] {
    override def zero: Buf = mutable.HashMap.empty
    override def reduce(b: Buf, a: Weighted): Buf = insert(b, a.v, a.w, cap)
    override def merge(b1: Buf, b2: Buf): Buf = mergeBufs(b1, b2, cap)
    override def finish(b: Buf): Seq[String] = top(b, n)
    override def bufferEncoder = Encoders.kryo[Buf]
    override def outputEncoder = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[String]]()
  }

  /** topK(n)(x): the ~n most frequent values of x, most frequent first
    * (ties broken by value — ClickHouse's order among equals is
    * unspecified; ours is deterministic).
    */
  def topK(c: Column, n: Int, loadFactor: Int = 3): Column =
    udaf(new TopKFreqAggregator(n, n * loadFactor), Encoders.STRING)
      .apply(c.cast(StringType))

  /** topKWeighted(n)(x, w): frequency is the sum of `w` per value. NULL
    * weights coalesce to 0 (= skipped) BEFORE the aggregator: the
    * product encoder's primitive Long field would otherwise throw on a
    * null row instead of skipping it.
    */
  def topKWeighted(c: Column, w: Column, n: Int, loadFactor: Int = 3): Column =
    udaf(new TopKWeightedAggregator(n, n * loadFactor),
      Encoders.product[Weighted])
      .apply(c.cast(StringType),
        org.apache.spark.sql.functions.coalesce(w.cast("long"),
          org.apache.spark.sql.functions.lit(0L)))
}
