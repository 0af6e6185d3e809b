package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The reference's `-State` / `-Merge` combinator machinery
  * (SURVEY.md §2.4; lectures/lecture_07.md:495-546, lectures/lecture_13.md:60-93):
  * partial-aggregate state persisted as a binary column
  * (`AggregateFunction(f, T)`), later folded with `-Merge` or
  * `finalizeAggregation`.
  *
  * Spark's internal partial/final aggregation isn't persistable, so each
  * state is an explicit serializable sketch with an `Aggregator` pair:
  * `xState` (values → state bytes) and `xMerge` (state bytes → final
  * value). States are associative and commutative, so a downstream merge
  * over arbitrarily re-partitioned state rows is exact — the property
  * AggregatingMergeTree relies on when merging parts.
  */
object StateSketches {

  // ---------- avg: state = (hundredths, count), exact on 2-decimal inputs

  final case class AvgBuf(var cents: Long, var cnt: Long)

  private[functions] def packAvg(b: AvgBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(b.cents); bb.putLong(b.cnt); bb.array()
  }
  private[functions] def unpackAvg(a: Array[Byte]): AvgBuf = {
    val bb = ByteBuffer.wrap(a)
    AvgBuf(bb.getLong(), bb.getLong())
  }

  /** avgState(x): partial avg state over doubles with 2-decimal precision
    * (fixed-point so the state is exactly mergeable in any order).
    */
  object AvgCentsState extends Aggregator[Double, AvgBuf, Array[Byte]] {
    def zero: AvgBuf = AvgBuf(0L, 0L)
    def reduce(b: AvgBuf, v: Double): AvgBuf = { b.cents += math.round(v * 100); b.cnt += 1; b }
    def merge(a: AvgBuf, b: AvgBuf): AvgBuf = { a.cents += b.cents; a.cnt += b.cnt; a }
    def finish(b: AvgBuf): Array[Byte] = packAvg(b)
    def bufferEncoder: Encoder[AvgBuf] = Encoders.product[AvgBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** avgMerge(state): fold avg states to the final double. */
  object AvgCentsMerge extends Aggregator[Array[Byte], AvgBuf, Double] {
    def zero: AvgBuf = AvgBuf(0L, 0L)
    def reduce(b: AvgBuf, v: Array[Byte]): AvgBuf = merge(b, unpackAvg(v))
    def merge(a: AvgBuf, b: AvgBuf): AvgBuf = { a.cents += b.cents; a.cnt += b.cnt; a }
    def finish(b: AvgBuf): Double = if (b.cnt == 0) Double.NaN else b.cents.toDouble / 100.0 / b.cnt
    def bufferEncoder: Encoder[AvgBuf] = Encoders.product[AvgBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  // ---------- sum/count/max states over longs (SimpleAggregateFunction
  // analogues: the state IS the value; lectures/lecture_07.md:502)

  final case class LongBuf(var v: Long)

  object SumLongState extends Aggregator[java.lang.Long, LongBuf, Long] {
    def zero: LongBuf = LongBuf(0L)
    // NULLs are skipped (boxed input encoder — a primitive Long encoder
    // would AssertNotNull and fail the query on the first NULL), the
    // same sum(NULL) semantics as CH/SQL
    def reduce(b: LongBuf, x: java.lang.Long): LongBuf = {
      if (x != null) b.v += x.longValue(); b
    }
    def merge(a: LongBuf, b: LongBuf): LongBuf = { a.v += b.v; a }
    def finish(b: LongBuf): Long = b.v
    def bufferEncoder: Encoder[LongBuf] = Encoders.product[LongBuf]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  // ---------- uniq: HyperLogLog state (the sketch behind uniqState /
  // uniqMerge / finalizeAggregation, lectures/lecture_13.md:60-93)

  /** Plain dense HLL, p=12 (4096 registers, ~1.6% rel. error), hashed with
    * MurmurHash64A (public domain algorithm). Deterministic: the same
    * inputs produce byte-identical states on any partitioning, and the
    * merge of partial states equals the state of the union.
    */
  object Hll {
    val P = 12
    val M: Int = 1 << P

    def murmur64(data: Array[Byte], seed: Long = 0x9747b28cL): Long = {
      val m = 0xc6a4a7935bd1e995L
      val r = 47
      var h = seed ^ (data.length * m)
      val full = data.length / 8
      var i = 0
      while (i < full) {
        var k = ByteBuffer.wrap(data, i * 8, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
        k *= m; k ^= k >>> r; k *= m
        h ^= k; h *= m
        i += 1
      }
      var rem = 0L
      var shift = 0
      var j = full * 8
      while (j < data.length) {
        rem |= (data(j) & 0xffL) << shift
        shift += 8; j += 1
      }
      if (shift > 0) { h ^= rem; h *= m }
      h ^= h >>> r; h *= m; h ^= h >>> r
      h
    }

    def add(regs: Array[Byte], value: String): Unit = {
      if (value != null) {
        val h = murmur64(value.getBytes("UTF-8"))
        val idx = (h >>> (64 - P)).toInt
        val rest = h << P
        val rank = (if (rest == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(rest)) + 1
        if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
      }
    }

    def mergeInto(a: Array[Byte], b: Array[Byte]): Unit = {
      var i = 0
      while (i < M) { if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i); i += 1 }
    }

    def estimate(regs: Array[Byte]): Long = {
      val alpha = 0.7213 / (1.0 + 1.079 / M)
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < M) {
        val r = regs(i) & 0xff
        sum += 1.0 / (1L << r)
        if (r == 0) zeros += 1
        i += 1
      }
      val e = alpha * M * M / sum
      val corrected =
        if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
        else e
      math.round(corrected)
    }
  }

  /** uniqState(x): build an HLL register state per group. */
  object UniqState extends Aggregator[String, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](Hll.M)
    def reduce(b: Array[Byte], v: String): Array[Byte] = { Hll.add(b, v); b }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = { Hll.mergeInto(a, b); a }
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** uniqMerge(state): fold HLL states and estimate the cardinality. */
  object UniqMerge extends Aggregator[Array[Byte], Array[Byte], Long] {
    def zero: Array[Byte] = new Array[Byte](Hll.M)
    def reduce(b: Array[Byte], v: Array[Byte]): Array[Byte] = { if (v != null) Hll.mergeInto(b, v); b }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = { Hll.mergeInto(a, b); a }
    def finish(b: Array[Byte]): Long = Hll.estimate(b)
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** finalizeAggregation for HLL states (lectures/lecture_13.md:148-182). */
  def finalizeUniq(state: Array[Byte]): Long = Hll.estimate(state)

  // ---------- quantile: Greenwald-Khanna summary state (the sketch
  // behind quantileState / quantileMerge in AggregatingMergeTree — like
  // CH's, the summary depends on arrival order, but the rank-error bound
  // holds under ANY merge order, which is what part merges need)

  import org.apache.spark.sql.catalyst.util.QuantileSummaries

  private val QRelErr = 0.01

  private[functions] def packQ(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val s = qs.sampled
    val bb = ByteBuffer.allocate(8 + 4 + 8 + 4 + s.length * 24)
    bb.putDouble(qs.relativeError)
    bb.putInt(qs.compressThreshold)
    bb.putLong(qs.count)
    bb.putInt(s.length)
    s.foreach { st => bb.putDouble(st.value); bb.putLong(st.g); bb.putLong(st.delta) }
    bb.array()
  }

  private[functions] def unpackQ(a: Array[Byte]): QuantileSummaries = {
    val bb = ByteBuffer.wrap(a)
    val relErr = bb.getDouble(); val thr = bb.getInt()
    val count = bb.getLong(); val n = bb.getInt()
    val s = Array.fill(n)(
      QuantileSummaries.Stats(bb.getDouble(), bb.getLong(), bb.getLong()))
    new QuantileSummaries(thr, relErr, s, count, true)
  }

  private def emptyQ: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, QRelErr)

  // count stays 0 until the head buffer flushes — ALWAYS compress before
  // testing emptiness or merging, or unflushed inserts silently vanish
  private def mergeQ(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries = {
    val ac = a.compress(); val bc = b.compress()
    if (bc.count == 0) ac else if (ac.count == 0) bc else ac.merge(bc)
  }

  /** quantileState(x): build a mergeable rank summary per group. NULLs are
    * skipped (boxed input encoder — a primitive Double encoder would hit
    * AssertNotNull and fail the query on the first NULL).
    */
  object QuantState
      extends Aggregator[java.lang.Double, QuantileSummaries, Array[Byte]] {
    def zero: QuantileSummaries = emptyQ
    def reduce(b: QuantileSummaries, v: java.lang.Double): QuantileSummaries =
      if (v == null) b else b.insert(v)
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      mergeQ(a, b)
    def finish(b: QuantileSummaries): Array[Byte] = packQ(b)
    def bufferEncoder: Encoder[QuantileSummaries] = Encoders.kryo[QuantileSummaries]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** quantileMerge(q)(state): fold states, query the q-quantile. */
  final class QuantMerge(q: Double)
      extends Aggregator[Array[Byte], QuantileSummaries, Double] {
    require(q >= 0 && q <= 1, s"quantile level in [0,1], got $q")
    def zero: QuantileSummaries = emptyQ
    def reduce(b: QuantileSummaries, v: Array[Byte]): QuantileSummaries =
      if (v == null) b else merge(b, unpackQ(v))
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      mergeQ(a, b)
    def finish(b: QuantileSummaries): Double =
      b.compress().query(q).getOrElse(Double.NaN)
    def bufferEncoder: Encoder[QuantileSummaries] = Encoders.kryo[QuantileSummaries]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  // ---------- Column-level entry points

  def avgState(c: Column): Column = udaf(AvgCentsState).apply(c)
  def avgMerge(c: Column): Column = udaf(AvgCentsMerge).apply(c)
  def sumLongState(c: Column): Column =
    udaf(SumLongState, Encoders.LONG).apply(c.cast("long"))
  def uniqState(c: Column): Column = udaf(UniqState).apply(c)
  def uniqMerge(c: Column): Column = udaf(UniqMerge).apply(c)
  def quantileState(c: Column): Column =
    udaf(QuantState, Encoders.DOUBLE)
      .apply(c.cast(org.apache.spark.sql.types.DoubleType))
  def quantileMerge(q: Double)(c: Column): Column =
    udaf(new QuantMerge(q)).apply(c)
}
