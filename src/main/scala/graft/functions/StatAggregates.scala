package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** ClickHouse's statistical aggregate family (SURVEY §2.4; the reference
  * exercises them ad hoc in lecture SQL): `skewPop`, `kurtPop`,
  * `covarPop/Samp`, `stddevPop/Samp`, `varPop/Samp`, `corr`, `entropy`,
  * `uniqUpTo(N)`.
  *
  * Moment-based members map onto Spark's native codegen'd aggregates
  * (single pass, partial/final merge — the same shape ClickHouse's
  * combinators use): Spark's `skewness` IS population skewness
  * (m3/sigma^3) and `kurtosis` is population EXCESS kurtosis, so CH's
  * non-excess `kurtPop` (m4/sigma^4) is `kurtosis + 3`.
  *
  * `entropy` (Shannon, base 2, over the value distribution) and
  * `uniqUpTo` have no Spark native; both are partial-aggregatable
  * `Aggregator`s. `entropy` carries a value→count map (state is
  * O(distinct), same as ClickHouse's hash-map state); `uniqUpTo` caps its
  * set at N+1 — the whole point of the ClickHouse original is bounded
  * state, so a `least(countDistinct, N+1)` rewrite would be cheating.
  */
object StatAggregates {

  // ---- moment family: CH name → Spark native -------------------------

  def skewPop(c: Column): Column = skewness(c)

  /** CH kurtPop = m4/sigma^4 (NOT excess); Spark kurtosis is excess. */
  def kurtPop(c: Column): Column = kurtosis(c) + lit(3.0)

  def covarPopCh(a: Column, b: Column): Column = covar_pop(a, b)
  def covarSampCh(a: Column, b: Column): Column = covar_samp(a, b)
  def corrCh(a: Column, b: Column): Column = corr(a, b)
  def stddevPopCh(c: Column): Column = stddev_pop(c)
  def stddevSampCh(c: Column): Column = stddev_samp(c)
  def varPopCh(c: Column): Column = var_pop(c)
  def varSampCh(c: Column): Column = var_samp(c)

  // ---- entropy -------------------------------------------------------

  type CountMap = mutable.HashMap[String, Long]

  /** Shannon entropy of the value distribution, base 2 — ClickHouse
    * `entropy(x)` (and DuckDB's `entropy`, which makes it oracle-able).
    * Computed as log2(n) - sum(c*log2(c))/n: one pass over the final
    * counter map, numerically stable for large n.
    */
  class EntropyAggregator extends Aggregator[String, CountMap, Double] {
    override def zero: CountMap = mutable.HashMap.empty
    override def reduce(b: CountMap, v: String): CountMap = {
      if (v != null) b.update(v, b.getOrElse(v, 0L) + 1L)
      b
    }
    override def merge(b1: CountMap, b2: CountMap): CountMap = {
      val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
      small.foreach { case (k, c) => big.update(k, big.getOrElse(k, 0L) + c) }
      big
    }
    override def finish(b: CountMap): Double = {
      val n = b.valuesIterator.sum
      if (n == 0L) 0.0
      else {
        val log2 = math.log(2.0)
        val s = b.valuesIterator.map(c => c * math.log(c.toDouble)).sum
        (math.log(n.toDouble) - s / n) / log2
      }
    }
    override def bufferEncoder = Encoders.kryo[CountMap]
    override def outputEncoder = Encoders.scalaDouble
  }

  /** entropy(x): NULLs are skipped (CH counts them as a value; DuckDB's
    * entropy skips them — we follow the oracle-able definition).
    */
  def entropy(c: Column): Column =
    udaf(new EntropyAggregator, Encoders.STRING).apply(c.cast(StringType))

  // ---- uniqUpTo(N) ---------------------------------------------------

  /** Bounded distinct set: stops growing at cap = N+1 elements, which is
    * exactly when the answer ("more than N") is already decided — O(N)
    * state per group on every map side regardless of true cardinality.
    */
  class UniqUpToAggregator(n: Int)
      extends Aggregator[String, mutable.HashSet[String], Long] {
    private val cap = n + 1
    override def zero: mutable.HashSet[String] = mutable.HashSet.empty
    override def reduce(b: mutable.HashSet[String],
                        v: String): mutable.HashSet[String] = {
      if (v != null && b.size < cap) b += v
      b
    }
    override def merge(b1: mutable.HashSet[String],
                       b2: mutable.HashSet[String]): mutable.HashSet[String] = {
      val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
      val it = small.iterator
      while (big.size < cap && it.hasNext) big += it.next()
      big
    }
    override def finish(b: mutable.HashSet[String]): Long = b.size.toLong
    override def bufferEncoder = Encoders.kryo[mutable.HashSet[String]]
    override def outputEncoder = Encoders.scalaLong
  }

  /** uniqUpTo(N)(x): exact distinct count while <= N, else N+1
    * ("N-or-more"). NULL is not counted (CH behavior for uniq family).
    */
  def uniqUpTo(c: Column, n: Int): Column = {
    require(n >= 1, s"uniqUpTo needs N >= 1, got $n")
    udaf(new UniqUpToAggregator(n), Encoders.STRING).apply(c.cast(StringType))
  }

  // ---- -ForEach combinators (element-wise across rows) ---------------

  /** Element-wise sums and per-position row counts; arrays of differing
    * lengths align on position (CH -ForEach semantics: result length =
    * max input length, absent positions contribute nothing).
    */
  final case class ForEachState(sums: Array[Double], counts: Array[Long])

  class ForEachAggregator(avg: Boolean)
      extends Aggregator[Seq[Double], ForEachState, Seq[Double]] {
    override def zero: ForEachState =
      ForEachState(Array.emptyDoubleArray, Array.emptyLongArray)
    private def grown(b: ForEachState, n: Int): ForEachState =
      if (b.sums.length >= n) b
      else ForEachState(java.util.Arrays.copyOf(b.sums, n),
        java.util.Arrays.copyOf(b.counts, n))
    override def reduce(b0: ForEachState, xs: Seq[Double]): ForEachState = {
      if (xs == null) return b0
      val b = grown(b0, xs.length)
      var i = 0
      while (i < xs.length) { b.sums(i) += xs(i); b.counts(i) += 1; i += 1 }
      b
    }
    override def merge(b1: ForEachState, b2: ForEachState): ForEachState = {
      val (small, big0) = if (b1.sums.length <= b2.sums.length) (b1, b2)
        else (b2, b1)
      val big = grown(big0, small.sums.length)
      var i = 0
      while (i < small.sums.length) {
        big.sums(i) += small.sums(i); big.counts(i) += small.counts(i)
        i += 1
      }
      big
    }
    override def finish(b: ForEachState): Seq[Double] =
      if (!avg) b.sums.toSeq
      else b.sums.indices.map(i => b.sums(i) / b.counts(i))
    override def bufferEncoder = Encoders.product[ForEachState]
    override def outputEncoder = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[Double]]()
  }

  private def forEachEnc = org.apache.spark.sql.catalyst.encoders
    .ExpressionEncoder[Seq[Double]]()

  /** sumForEach(arr): element-wise sum across the group's arrays — the
    * vector-accumulation combinator (embedding centroids fall out of
    * [[avgForEach]]). Partial-aggregatable, O(dim) state per group.
    * Array elements must be non-null.
    */
  def sumForEach(c: Column): Column =
    udaf(new ForEachAggregator(avg = false), forEachEnc)
      .apply(c.cast("array<double>"))

  /** avgForEach(arr): element-wise mean (per-position row counts, so
    * ragged lengths average over the rows that HAVE the position).
    */
  def avgForEach(c: Column): Column =
    udaf(new ForEachAggregator(avg = true), forEachEnc)
      .apply(c.cast("array<double>"))

  // ---- categorical association: cramersV / contingency ---------------

  type PairCounts = mutable.HashMap[(String, String), Long]

  /** Contingency-table state (category-pair -> count; state is bounded
    * by category-pair cardinality, same as ClickHouse's); finish folds
    * the chi-square statistic. `bias` false → Cramér's V, true →
    * Pearson's contingency coefficient C = sqrt(chi2 / (chi2 + n)).
    */
  class AssociationAggregator(contingencyC: Boolean)
      extends Aggregator[(String, String), PairCounts, Double] {
    override def zero: PairCounts = mutable.HashMap.empty
    override def reduce(b: PairCounts, v: (String, String)): PairCounts = {
      if (v._1 != null && v._2 != null)
        b.update(v, b.getOrElse(v, 0L) + 1L)
      b
    }
    override def merge(b1: PairCounts, b2: PairCounts): PairCounts = {
      val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
      small.foreach { case (k, c) => big.update(k, big.getOrElse(k, 0L) + c) }
      big
    }
    override def finish(b: PairCounts): Double = {
      if (b.isEmpty) return 0.0
      val rowM = mutable.HashMap.empty[String, Long]
      val colM = mutable.HashMap.empty[String, Long]
      var n = 0L
      b.foreach { case ((a, c), o) =>
        rowM.update(a, rowM.getOrElse(a, 0L) + o)
        colM.update(c, colM.getOrElse(c, 0L) + o)
        n += o
      }
      // chi-square over the FULL r×c table: observed cells directly;
      // every absent cell contributes (0-e)^2/e = e, and the e's over all
      // cells sum to n — so the absent-cell mass is n - sum(e_observed)
      var chi2 = 0.0
      var eObs = 0.0
      b.foreach { case ((a, c), o) =>
        val e = rowM(a).toDouble * colM(c).toDouble / n
        val d = o - e
        chi2 += d * d / e
        eObs += e
      }
      chi2 += n - eObs
      if (contingencyC) math.sqrt(chi2 / (chi2 + n))
      else {
        val k = math.min(rowM.size, colM.size) - 1
        if (k <= 0) 0.0 else math.sqrt(chi2 / n / k)
      }
    }
    override def bufferEncoder = Encoders.kryo[PairCounts]
    override def outputEncoder = Encoders.scalaDouble
  }

  private def pairEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)

  /** cramersV(a, b): association strength in [0, 1] between two
    * categorical columns (chi-square normalized); NULL pairs skipped.
    */
  def cramersV(a: Column, b: Column): Column =
    udaf(new AssociationAggregator(contingencyC = false), pairEnc)
      .apply(a.cast(StringType), b.cast(StringType))

  /** Pearson's contingency coefficient over the same state. */
  def contingency(a: Column, b: Column): Column =
    udaf(new AssociationAggregator(contingencyC = true), pairEnc)
      .apply(a.cast(StringType), b.cast(StringType))

  /** theilsU(a, b): the uncertainty coefficient U(a|b) =
    * (H(A) − H(A|B)) / H(A) — how much knowing `b` reduces the entropy
    * of `a`, in [0, 1]; asymmetric, unlike cramersV. Same PairCounts
    * state as the chi-square family; the finish iterates cells in
    * sorted key order so the double sums are deterministic.
    */
  class TheilsUAggregator
      extends Aggregator[(String, String), PairCounts, Double] {
    override def zero: PairCounts = mutable.HashMap.empty
    override def reduce(b: PairCounts, v: (String, String)): PairCounts = {
      if (v._1 != null && v._2 != null)
        b.update(v, b.getOrElse(v, 0L) + 1L)
      b
    }
    override def merge(b1: PairCounts, b2: PairCounts): PairCounts = {
      val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
      small.foreach { case (k, c) => big.update(k, big.getOrElse(k, 0L) + c) }
      big
    }
    override def finish(b: PairCounts): Double = {
      if (b.isEmpty) return 0.0
      val rowM = mutable.HashMap.empty[String, Long]
      val colM = mutable.HashMap.empty[String, Long]
      var n = 0L
      b.foreach { case ((a, c), o) =>
        rowM.update(a, rowM.getOrElse(a, 0L) + o)
        colM.update(c, colM.getOrElse(c, 0L) + o)
        n += o
      }
      val nD = n.toDouble
      var hA = 0.0
      rowM.toSeq.sortBy(_._1).foreach { case (_, na) =>
        val p = na / nD
        hA -= p * math.log(p)
      }
      if (hA == 0.0) return 1.0 // a is constant: fully determined
      var hAB = 0.0
      b.toSeq.sortBy(_._1).foreach { case ((_, c), o) =>
        hAB -= (o / nD) * math.log(o.toDouble / colM(c))
      }
      (hA - hAB) / hA
    }
    override def bufferEncoder = Encoders.kryo[PairCounts]
    override def outputEncoder = Encoders.scalaDouble
  }

  def theilsU(a: Column, b: Column): Column =
    udaf(new TheilsUAggregator, pairEnc)
      .apply(a.cast(StringType), b.cast(StringType))

  // ---- largestTriangleThreeBuckets (CH lttb) --------------------------

  /** LTTB downsampling (Steinarsson 2013, the algorithm CH's
    * `largestTriangleThreeBuckets` implements): keep `n` of the series'
    * points — endpoints fixed, each middle bucket contributing the point
    * with the largest triangle area against the previously selected
    * point and the next bucket's centroid. Pure function over one key's
    * SORTED series; callers aggregate with `sort_array(collect_list(
    * struct(x, y)))` per key (per-key series must be driver-reasonable —
    * the same per-key-bounded contract as the funnel buffers).
    */
  def lttb(points: Seq[(Double, Double)], n: Int): Seq[(Double, Double)] = {
    require(n >= 2, "lttb needs n >= 2")
    val m = points.length
    if (m <= n) return points
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    out += points.head
    // m-2 interior points into n-2 equal buckets
    val every = (m - 2).toDouble / (n - 2)
    var a = 0 // index of the previously SELECTED point
    var i = 0
    while (i < n - 2) {
      val bStart = (i * every).toInt + 1
      val bEnd = math.min(((i + 1) * every).toInt + 1, m - 1)
      val cStart = bEnd
      val cEnd = math.min(((i + 2) * every).toInt + 1, m)
      // centroid of the NEXT bucket (the last "bucket" is the endpoint)
      var cx = 0.0; var cy = 0.0
      val cLen = math.max(cEnd - cStart, 1)
      var j = cStart
      while (j < cStart + cLen) {
        val p = points(math.min(j, m - 1)); cx += p._1; cy += p._2; j += 1
      }
      cx /= cLen; cy /= cLen
      val pa = points(a)
      var best = bStart
      var bestArea = -1.0
      j = bStart
      while (j < bEnd) {
        val p = points(j)
        val area = math.abs((pa._1 - cx) * (p._2 - pa._2) -
          (pa._1 - p._1) * (cy - pa._2)) * 0.5
        if (area > bestArea) { bestArea = area; best = j }
        j += 1
      }
      out += points(best)
      a = best
      i += 1
    }
    out += points.last
    out.toSeq
  }

  // ---- histogram(N): adaptive streaming histogram ---------------------

  /** One (center, weight) bin. */
  final case class HBin(c: Double, w: Double)

  /** ClickHouse `histogram(N)(x)`: the streaming adaptive histogram
    * (Ben-Haim & Tom-Tov) — keep sorted (center, weight) bins, insert
    * each value as a weight-1 bin, merge the CLOSEST adjacent pair
    * whenever capacity overflows (weighted-mean center). Bin centers are
    * data-dependent (rows-only by nature, like CH's); totals and bounds
    * are exact. Mergeable — concat + re-compact — so partial aggregation
    * applies.
    */
  class HistogramAggregator(nBins: Int)
      extends Aggregator[java.lang.Double, Seq[HBin], Seq[HBin]] {
    require(nBins >= 1, s"histogram needs >= 1 bin, got $nBins")
    private def compact(sorted: List[HBin]): List[HBin] = {
      // lossless pre-pass: adjacent equal centers coalesce regardless of
      // capacity (duplicate values must not occupy two bins)
      var bins = sorted.foldRight(List.empty[HBin]) {
        case (a, h :: t) if a.c == h.c => HBin(a.c, a.w + h.w) :: t
        case (a, acc) => a :: acc
      }
      while (bins.length > nBins) {
        // find index of the closest adjacent pair
        var best = 0
        var bestGap = Double.MaxValue
        var i = 0
        var cur = bins
        while (cur.tail.nonEmpty) {
          val gap = cur.tail.head.c - cur.head.c
          if (gap < bestGap) { bestGap = gap; best = i }
          cur = cur.tail
          i += 1
        }
        val (pre, rest) = bins.splitAt(best)
        val a :: b :: post = rest: @unchecked
        val w = a.w + b.w
        bins = pre ::: (HBin((a.c * a.w + b.c * b.w) / w, w) :: post)
      }
      bins
    }
    override def zero: Seq[HBin] = Nil
    override def reduce(b: Seq[HBin], v: java.lang.Double): Seq[HBin] = {
      // NULLs are skipped (a primitive input encoder would AssertNotNull)
      if (v == null) return b
      val d = v.doubleValue()
      val (lt, ge) = b.partition(_.c < d)
      compact(lt.toList ::: (HBin(d, 1.0) :: ge.toList))
    }
    override def merge(b1: Seq[HBin], b2: Seq[HBin]): Seq[HBin] =
      compact((b1 ++ b2).sortBy(_.c).toList)
    override def finish(b: Seq[HBin]): Seq[HBin] = b
    override def bufferEncoder = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[HBin]]()
    override def outputEncoder = org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[HBin]]()
  }

  /** histogram(N)(x) — adaptive bins as (center, weight) structs.
    * NULLs are skipped (boxed input encoder), matching CH/DuckDB.
    */
  def histogramAgg(c: Column, nBins: Int): Column =
    udaf(new HistogramAggregator(nBins), Encoders.DOUBLE)
      .apply(c.cast(DoubleType))

  // ---------- two-sample t-tests (CH welchTTest / studentTTest): pure
  // compositions of native partial-aggregatable moments — one codegen'd
  // pass, no custom state. Rows where `group` is true form sample 1,
  // false sample 2; NULL x / NULL group rows are skipped (conditional
  // aggregate semantics). Output: struct(t, df).

  /** welchTTest(x, group): unequal-variance t statistic with
    * Welch–Satterthwaite degrees of freedom.
    */
  def welchTTest(x: Column, group: Column): Column = {
    val xd = x.cast(DoubleType)
    val x1 = when(group, xd)
    val x2 = when(!group, xd)
    val n1 = count(x1).cast(DoubleType)
    val n2 = count(x2).cast(DoubleType)
    val se1 = var_samp(x1) / n1
    val se2 = var_samp(x2) / n2
    val se = se1 + se2
    val t = (avg(x1) - avg(x2)) / sqrt(se)
    val df = (se * se) /
      (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
    struct(t.as("t"), df.as("df"))
  }

  /** mannWhitneyUTest(x, group) per `key`: rank-sum U statistics with
    * average ranks for ties and the tie-corrected normal-approximation
    * z. One ordered window per key + one aggregation on the SAME key
    * (Exchange reused — a single shuffle). All rank arithmetic is exact
    * in doubles (average ranks are multiples of 0.5, tie counts are
    * integers), so both engines compute identical values before any
    * rounding. Output: (key, u1, u2, z).
    */
  def mannWhitneyU(df: org.apache.spark.sql.DataFrame, key: Column,
                   x: Column, g: Column): org.apache.spark.sql.DataFrame = {
    val ranked = df.select(key.as("key"), x.as("__x"), g.as("__g"))
      .withColumn("__rmin", rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("__x"))))
      .withColumn("__t", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key"), col("__x"))).cast(DoubleType))
    ranked.groupBy(col("key"))
      .agg(
        sum(when(col("__g"), 1).otherwise(0)).cast(DoubleType).as("__n1"),
        sum(when(!col("__g"), 1).otherwise(0)).cast(DoubleType).as("__n2"),
        sum(when(col("__g"), col("__rmin") + (col("__t") - 1.0) / 2.0)).as("__r1"),
        // per-row (t²-1) sums to Σ over distinct values of (t³ - t)
        sum(col("__t") * col("__t") - 1.0).as("__ts"))
      .withColumn("u1", col("__r1") - col("__n1") * (col("__n1") + 1.0) / 2.0)
      .withColumn("u2", col("__n1") * col("__n2") - col("u1"))
      .withColumn("__n", col("__n1") + col("__n2"))
      .withColumn("z",
        (col("u1") - col("__n1") * col("__n2") / 2.0) /
          sqrt(col("__n1") * col("__n2") / 12.0 *
            ((col("__n") + 1.0) -
              col("__ts") / (col("__n") * (col("__n") - 1.0)))))
      .select(col("key"), col("u1"), col("u2"), col("z"))
  }

  /** kolmogorovSmirnovTest(x, group) per `key`: the two-sample KS D
    * statistic — max ECDF gap, with ties handled by evaluating both
    * ECDFs at tie-group ends (max of the running counts within each
    * distinct value). Running counts are exact integers and the ECDF
    * quotients divide exact doubles, so both engines agree unrounded.
    * One ordered window + two aggregations, all on the same key prefix.
    * Output: (key, n1, n2, d).
    */
  def kolmogorovSmirnov(df: org.apache.spark.sql.DataFrame, key: Column,
                        x: Column, g: Column): org.apache.spark.sql.DataFrame = {
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("__x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    df.select(key.as("key"), x.as("__x"), g.as("__g"))
      .withColumn("__c1",
        sum(when(col("__g"), 1).otherwise(0)).over(wCum).cast(DoubleType))
      .withColumn("__c2",
        sum(when(!col("__g"), 1).otherwise(0)).over(wCum).cast(DoubleType))
      .groupBy(col("key"), col("__x"))
      .agg(max(col("__c1")).as("__c1"), max(col("__c2")).as("__c2"))
      .withColumn("__n1", max(col("__c1")).over(wKey))
      .withColumn("__n2", max(col("__c2")).over(wKey))
      .groupBy(col("key"))
      .agg(max(col("__n1")).as("n1"), max(col("__n2")).as("n2"),
        max(abs(col("__c1") / col("__n1") - col("__c2") / col("__n2"))).as("d"))
  }

  /** exponentialMovingAverage(halfLife)(v, t) per `key`: time-decayed
    * average — Σ v·2^((t−t_max)/hl) / Σ 2^((t−t_max)/hl). The t_max
    * shift cancels algebraically in the ratio but keeps the exponents
    * ≤ 0 so nothing overflows at epoch-second timestamps; it comes from
    * a partition window on the SAME key as the final aggregation (one
    * shuffle). Output: (key, ema).
    */
  def exponentialMovingAverage(df: org.apache.spark.sql.DataFrame,
                               key: Column, v: Column, t: Column,
                               halfLife: Double): org.apache.spark.sql.DataFrame = {
    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    df.select(key.as("key"), v.cast(DoubleType).as("__v"),
        t.cast(DoubleType).as("__t"))
      .withColumn("__w",
        pow(lit(2.0), (col("__t") - max(col("__t")).over(wKey)) / halfLife))
      .groupBy(col("key"))
      .agg((sum(col("__v") * col("__w")) / sum(col("__w"))).as("ema"))
  }

  /** studentTTest(x, group): pooled-variance t statistic, df = n1+n2-2. */
  def studentTTest(x: Column, group: Column): Column = {
    val xd = x.cast(DoubleType)
    val x1 = when(group, xd)
    val x2 = when(!group, xd)
    val n1 = count(x1).cast(DoubleType)
    val n2 = count(x2).cast(DoubleType)
    val sp2 = ((n1 - 1.0) * var_samp(x1) + (n2 - 1.0) * var_samp(x2)) /
      (n1 + n2 - 2.0)
    val t = (avg(x1) - avg(x2)) / sqrt(sp2 * (lit(1.0) / n1 + lit(1.0) / n2))
    struct(t.as("t"), (n1 + n2 - 2.0).as("df"))
  }

  /** meanZTest(popVarX, popVarY)(x, group): two-sample z statistic with
    * KNOWN population variances — z = (mean1 − mean2) / sqrt(v1/n1 + v2/n2).
    * Same conditional-moment composition as the t-tests: one codegen'd
    * pass, no custom state.
    */
  def meanZTest(x: Column, group: Column,
                popVarX: Double, popVarY: Double): Column = {
    val xd = x.cast(DoubleType)
    val x1 = when(group, xd)
    val x2 = when(!group, xd)
    val n1 = count(x1).cast(DoubleType)
    val n2 = count(x2).cast(DoubleType)
    (avg(x1) - avg(x2)) / sqrt(lit(popVarX) / n1 + lit(popVarY) / n2)
  }

  /** avgWeighted(x, w) (CH): Σ x·w / Σ w, skipping rows where either side
    * is NULL (CH aggregate-argument semantics). Pure native moments.
    */
  def avgWeighted(x: Column, w: Column): Column = {
    val ok = x.isNotNull && w.isNotNull
    val xd = when(ok, x.cast(DoubleType))
    val wd = when(ok, w.cast(DoubleType))
    sum(xd * wd) / sum(wd)
  }

  /** boundingRatio(x, y) (CH): slope of the chord between the series
    * endpoints ordered by x — (y at max x − y at min x)/(max x − min x).
    * Native min/max/min_by/max_by, single pass.
    */
  def boundingRatio(x: Column, y: Column): Column = {
    val xd = x.cast(DoubleType)
    val yd = y.cast(DoubleType)
    (max_by(yd, xd) - min_by(yd, xd)) / (max(xd) - min(xd))
  }

  /** rankCorr(x, y) per `key` (CH rankCorr): Spearman rank correlation —
    * Pearson `corr` over average ranks (ties get the mean of their rank
    * range, CH's convention). Ranks come from two ordered windows on the
    * SAME partition key as the final aggregation, so the plan is one
    * shuffle + two in-partition sorts; parallelism is per-key, exactly
    * like [[mannWhitneyU]]. Average ranks are multiples of 0.5 and exact
    * in doubles; only the final correlation quotient needs rounding.
    * Output: (key, rank_corr).
    */
  def rankCorr(df: org.apache.spark.sql.DataFrame, key: Column,
               x: Column, y: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def avgRank(v: String): Column =
      rank().over(Window.partitionBy(col("key")).orderBy(col(v))) +
        (count(lit(1)).over(Window.partitionBy(col("key"), col(v)))
          .cast(DoubleType) - 1.0) / 2.0
    df.select(key.as("key"), x.cast(DoubleType).as("__x"),
        y.cast(DoubleType).as("__y"))
      .withColumn("__rx", avgRank("__x"))
      .withColumn("__ry", avgRank("__y"))
      .groupBy(col("key"))
      .agg(corr(col("__rx"), col("__ry")).as("rank_corr"))
  }

  /** categoricalInformationValue(cat, tag) (CH): per-category information
    * value of a binary tag — (g_i/G − b_i/B) · ln((g_i/G)/(b_i/B)), with
    * zero cells contributing 0 (guarded identically in the oracle; CH
    * emits non-finite values there, which no cross-engine hash can
    * carry). Two key-wise aggregations — (cat) counts then a broadcast of
    * the two scalar totals — so the plan is one data-sized shuffle.
    * Output: (cat, iv) rows, CH's array flattened to its indexed rows.
    */
  def categoricalInformationValue(df: org.apache.spark.sql.DataFrame,
                                  cat: Column, tag: Column): org.apache.spark.sql.DataFrame = {
    val counts = df.select(cat.as("cat"), tag.cast("boolean").as("__t"))
      .groupBy(col("cat"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__g"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__b"))
    val totals = counts.agg(sum(col("__g")).as("__gt"), sum(col("__b")).as("__bt"))
    counts.crossJoin(broadcast(totals))
      .withColumn("iv",
        when(col("__g") > 0 && col("__b") > 0,
          (col("__g").cast(DoubleType) / col("__gt") -
            col("__b").cast(DoubleType) / col("__bt")) *
            log((col("__g").cast(DoubleType) / col("__gt")) /
              (col("__b").cast(DoubleType) / col("__bt"))))
          .otherwise(lit(0.0)))
      .select(col("cat"), col("iv"))
  }
}
