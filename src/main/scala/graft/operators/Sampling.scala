package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** One (hash-order, key) pair flowing into the per-stratum min-k cutoff. */
case class HashedKey(h: Long, id: Long)

/** Bounded min-k buffer over (h asc, id asc) — the ascending-long twin of
  * [[TopKState]]: first `n` slots of two parallel primitive arrays,
  * allocated once at capacity k and mutated in place (insertion-shift).
  * Longs, not doubles: hash order is a 60-bit value, and a double's
  * 53-bit mantissa would merge distinct hashes into ties.
  */
case class MinKState(var n: Int, hs: Array[Long], ids: Array[Long])

/** Partial-aggregatable per-group smallest-k of (h, id) pairs. Replaces
  * `row_number() OVER (PARTITION BY stratum ORDER BY h, id) <= k`: the
  * window funnels each stratum's full row set through one reducer (a few
  * strata → a few hot reducers at 100 TB), while this keeps O(k) state
  * per stratum on every map side and merges k-vs-k at the final stage.
  */
class MinKAggregator(k: Int)
    extends Aggregator[HashedKey, MinKState, MinKState] {

  override def zero: MinKState =
    MinKState(0, Array.emptyLongArray, Array.emptyLongArray)

  @inline private def before(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
    h1 < h2 || (h1 == h2 && i1 < i2)

  override def reduce(b0: MinKState, a: HashedKey): MinKState = {
    val b = if (b0.hs.length < k)
      MinKState(b0.n, java.util.Arrays.copyOf(b0.hs, k),
        java.util.Arrays.copyOf(b0.ids, k))
    else b0
    val n = b.n
    if (n == k && !before(a.h, a.id, b.hs(n - 1), b.ids(n - 1))) return b
    var pos = n
    while (pos > 0 && before(a.h, a.id, b.hs(pos - 1), b.ids(pos - 1)))
      pos -= 1
    val keep = math.min(n, k - 1)
    if (keep > pos) {
      System.arraycopy(b.hs, pos, b.hs, pos + 1, keep - pos)
      System.arraycopy(b.ids, pos, b.ids, pos + 1, keep - pos)
    }
    b.hs(pos) = a.h
    b.ids(pos) = a.id
    b.n = math.min(n + 1, k)
    b
  }

  override def merge(b1: MinKState, b2: MinKState): MinKState = {
    if (b2.n == 0) return b1
    if (b1.n == 0) return b2
    val m = math.min(b1.n + b2.n, k)
    val hs = new Array[Long](m)
    val ids = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeLeft = j >= b2.n ||
        (i < b1.n && before(b1.hs(i), b1.ids(i), b2.hs(j), b2.ids(j)))
      if (takeLeft) { hs(o) = b1.hs(i); ids(o) = b1.ids(i); i += 1 }
      else { hs(o) = b2.hs(j); ids(o) = b2.ids(j); j += 1 }
      o += 1
    }
    MinKState(m, hs, ids)
  }

  override def finish(b: MinKState): MinKState =
    if (b.n == b.hs.length) b
    else MinKState(b.n, java.util.Arrays.copyOf(b.hs, b.n),
      java.util.Arrays.copyOf(b.ids, b.n))
  override def bufferEncoder = Encoders.product[MinKState]
  override def outputEncoder = Encoders.product[MinKState]
}

/** Deterministic sampling for training-data curation: per-stratum rate
  * sampling (a fixed fraction of each source/language) and per-stratum
  * quota sampling (exactly n documents of each). Both are pure functions
  * of (salt, key) — no rand(), no ordering dependence — so any engine can
  * reproduce and audit the exact selection (the oracle recomputes it),
  * and reruns over regrown corpora select consistently.
  */
object Sampling {

  /** 60-bit hash order: first 15 md5 hex digits of "salt:key" as a long.
    * The full-width sibling of [[DatasetSplit.bucket]] — order, not
    * buckets, so quotas need no tie inflation.
    */
  def hashOrder(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 15),
      16, 10).cast(LongType)

  /** Keep a per-stratum fraction of rows: keep iff md5 bucket(key) <
    * floor(fraction(stratum) * 10000). Map-side only (codegen'd CASE over
    * the driver-resolved integer thresholds — no shuffle, no sampling
    * pass) and append-stable: new rows never flip old decisions. Strata
    * not in `fractions` keep `defaultFraction` of their rows.
    */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0,
                       salt: String = ""): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0,1], got $fractions default=$defaultFraction")
    val b = DatasetSplit.bucket(key, salt)
    val thr = fractions.foldLeft(
      lit(math.floor(defaultFraction * 10000).toLong): Column) {
      case (acc, (s, frac)) =>
        when(strata <=> lit(s), lit(math.floor(frac * 10000).toLong))
          .otherwise(acc)
    }
    df.filter(b < thr)
  }

  /** Exactly min(n, |stratum|) rows per stratum — quota sampling (e.g.
    * "10k eval docs per language"), deterministic in (salt, key).
    *
    * Two phases, neither a per-stratum window: (1) a partial-aggregated
    * [[MinKAggregator]] computes each stratum's n-th smallest (hash, key)
    * cutoff pair with O(n) state per stratum on every map side; (2) the
    * cutoffs (one row per stratum) broadcast back and a map-side filter
    * keeps rows at-or-under their stratum's cutoff. `key` must be
    * integral and unique per row (ties break on it).
    */
  def stratifiedExactN(df: DataFrame, strata: Column, key: Column, n: Int,
                       salt: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    val withH = df
      .withColumn("__h", hashOrder(key, salt))
      .withColumn("__id", key.cast(LongType))
    val agg = udaf(new MinKAggregator(n), Encoders.product[HashedKey])
    val cut = withH.groupBy(strata.as("__s"))
      .agg(agg(col("__h"), col("__id")).as("__mk"))
      .select(col("__s"),
        element_at(col("__mk.hs"), col("__mk.n")).as("__cutH"),
        element_at(col("__mk.ids"), col("__mk.n")).as("__cutId"))
    withH.join(broadcast(cut), strata <=> col("__s"))
      .filter(col("__h") < col("__cutH") ||
        (col("__h") === col("__cutH") && col("__id") <= col("__cutId")))
      .drop("__s", "__cutH", "__cutId", "__h", "__id")
  }

  /** Exponential-clock order key for weighted sampling (Efraimidis &
    * Spirakis A-ES): E = -ln(u)/w with u the deterministic md5-uniform
    * of (salt, key) mapped into (0,1). The N smallest E values are a
    * weight-proportional-without-replacement sample; selection is a pure
    * function of (salt, key, weight), so the oracle recomputes it.
    * `weight` must be > 0 (a non-positive weight makes E non-positive
    * and the row sorts ahead of every real candidate).
    *
    * Cross-engine caveat: ln() is only ~1-ulp-accurate and differs
    * between libms, so two E values within an ulp of each other could in
    * principle order differently in another engine; for a selection of n
    * from N rows the probability that such a near-tie straddles the
    * cutoff is ~N·2⁻⁵², negligible at any realistic scale (and unlike
    * value comparisons, no rounding can absorb it — noted rather than
    * worked around).
    */
  def weightedOrder(key: Column, weight: Column, salt: String): Column =
    -log((hashOrder(key, salt).cast(DoubleType) + lit(0.5)) /
      lit(1152921504606846976.0 /* 2^60 */)) / weight

  /** Exactly min(n, |df|) rows, inclusion probability proportional to
    * `weight` — the same two-phase min-k shape as [[stratifiedExactN]]
    * (O(n) partial-aggregated state, broadcast cutoff, map-side filter;
    * never a global sort). Double keys ride the long-keyed
    * [[MinKAggregator]] via the order-preserving IEEE bits remap
    * (`graft_double_bits`), so no precision is lost to a cast.
    */
  def weightedExactN(df: DataFrame, key: Column, weight: Column, n: Int,
                     salt: String = ""): DataFrame = {
    require(n > 0, "n must be positive")
    val withH = df
      .withColumn("__e", graft.plans.NativeFunctions.doubleBits(
        weightedOrder(key, weight, salt)))
      .withColumn("__id", key.cast(LongType))
    val agg = udaf(new MinKAggregator(n), Encoders.product[HashedKey])
    val cut = withH.agg(agg(col("__e"), col("__id")).as("__mk"))
      .select(element_at(col("__mk.hs"), col("__mk.n")).as("__cutH"),
        element_at(col("__mk.ids"), col("__mk.n")).as("__cutId"))
    withH.join(broadcast(cut))
      .filter(col("__e") < col("__cutH") ||
        (col("__e") === col("__cutH") && col("__id") <= col("__cutId")))
      .drop("__cutH", "__cutId", "__e", "__id")
  }
}
