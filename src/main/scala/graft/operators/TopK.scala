package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One (neighbor id, score) candidate flowing into the top-k aggregate. */
case class ScoredNeighbor(id: Long, score: Double)

/** Bounded top-k buffer: the first `n` slots of two parallel primitive
  * arrays, sorted by (score desc, id asc). Arrays are allocated ONCE at
  * fixed capacity k on a group's first candidate and mutated in place
  * after that (insertion-shift) — zero allocation on the hot reduce path.
  * Parallel primitive arrays (not an array of structs) keep the
  * serialized partial state two flat buffers.
  */
case class TopKState(var n: Int, ids: Array[Long], scores: Array[Double])

/** Partial-aggregatable per-group top-k, the scalable replacement for a
  * `row_number` window partitioned by query id: the window shape funnels
  * O(candidates) rows for a query into ONE reducer, while this Aggregator
  * keeps O(k) state per query on every map side and merges k-vs-k at the
  * final stage — the per-group analogue of the TakeOrderedAndProject plan
  * Spark picks for a global ORDER BY + LIMIT.
  *
  * Ordering is (score desc, id asc), matching
  * `Window.orderBy(col(score).desc, col(id))` so results are identical to
  * the window formulation it replaces.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredNeighbor, TopKState, TopKState] {

  override def zero: TopKState =
    TopKState(0, Array.emptyLongArray, Array.emptyDoubleArray)

  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def reduce(b0: TopKState, a: ScoredNeighbor): TopKState = {
    // one-time capacity-k allocation per group (zero's empty arrays are
    // shared and never mutated); every later candidate mutates in place
    val b = if (b0.ids.length < k)
      TopKState(b0.n, java.util.Arrays.copyOf(b0.ids, k),
        java.util.Arrays.copyOf(b0.scores, k))
    else b0
    val n = b.n
    // fast path: buffer full and the candidate loses to the current tail
    if (n == k && !beats(a.score, a.id, b.scores(n - 1), b.ids(n - 1))) return b
    var pos = n
    while (pos > 0 && beats(a.score, a.id, b.scores(pos - 1), b.ids(pos - 1)))
      pos -= 1
    val keep = math.min(n, k - 1) // entries surviving right of the insert
    if (keep > pos) {
      System.arraycopy(b.ids, pos, b.ids, pos + 1, keep - pos)
      System.arraycopy(b.scores, pos, b.scores, pos + 1, keep - pos)
    }
    b.ids(pos) = a.id
    b.scores(pos) = a.score
    b.n = math.min(n + 1, k)
    b
  }

  override def merge(b1: TopKState, b2: TopKState): TopKState = {
    if (b2.n == 0) return b1
    if (b1.n == 0) return b2
    val m = math.min(b1.n + b2.n, k)
    val ids = new Array[Long](m)
    val scores = new Array[Double](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeLeft = j >= b2.n ||
        (i < b1.n &&
          beats(b1.scores(i), b1.ids(i), b2.scores(j), b2.ids(j)))
      if (takeLeft) { ids(o) = b1.ids(i); scores(o) = b1.scores(i); i += 1 }
      else { ids(o) = b2.ids(j); scores(o) = b2.scores(j); j += 1 }
      o += 1
    }
    TopKState(m, ids, scores)
  }

  override def finish(b: TopKState): TopKState =
    if (b.n == b.ids.length) b
    else TopKState(b.n, java.util.Arrays.copyOf(b.ids, b.n),
      java.util.Arrays.copyOf(b.scores, b.n))
  override def bufferEncoder = Encoders.product[TopKState]
  override def outputEncoder = Encoders.product[TopKState]
}

object TopK {

  /** Per-group top-k of `(idCol, scoreCol)` rows grouped by `groupCols`,
    * emitted as (groupCols*, rank, idCol, scoreCol) — identical rows to
    * `row_number() OVER (PARTITION BY group ORDER BY score DESC, id)
    * WHERE rank <= k`, but with O(k) partial-aggregated state instead of
    * a per-group window reducer. `idCol` must be integral (widened to
    * Long internally and cast back by the caller if needed).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
               scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k), Encoders.product[ScoredNeighbor])
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(col(idCol).cast("long"), col(scoreCol).cast("double")).as("__tk"))
      .select(groupCols.map(col) :+ col("__tk.scores").as("__sc") :+
        posexplode(col("__tk.ids")).as(Seq("__pos", "__nid")): _*)
      .select(groupCols.map(col) :+
        (col("__pos") + 1).as("rank") :+
        col("__nid").as(idCol) :+
        element_at(col("__sc"), (col("__pos") + 1).cast("int")).as(scoreCol): _*)
  }
}
