package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** ClickHouse's bitmap family (SURVEY §2.4: `groupBitmap`,
  * `groupBitmapState` + `bitmapCardinality` / `bitmapAnd*` / `bitmapOr*` /
  * `bitmapContains`; the reference leans on it for audience-overlap SQL):
  * an integer-set aggregate whose state is a compressed bitmap that can be
  * persisted (the -State/-Merge pattern, same as
  * [[graft.functions.StateSketches]]) and combined across groups with set
  * algebra — the cheap way to answer "users who did A and B" without
  * re-joining fact rows.
  *
  * Storage is Roaring-shaped (Chambi et al., "Better bitmap performance
  * with Roaring bitmaps"): values split on the high 16 bits into chunks;
  * each chunk serializes as a sorted u16 ARRAY when sparse (<= 4096
  * values, 2 bytes/value) or a fixed 8 KiB BITMAP when dense — so state
  * size tracks true cardinality, not the id-space width. Aggregation
  * buffers hold chunks as BitSets over the low 16 bits (bounded 8 KiB
  * per chunk, lazily grown); merges are word-wise ORs.
  *
  * Scale shape: partial-aggregatable (map-side combine applies), state
  * O(cardinality) per group, set ops on states touch only chunk pairs
  * present on either side. Values must be in [0, 2^31).
  */
object BitmapAggregates {

  /** chunk high-bits -> set of low 16 bits */
  type Buf = mutable.HashMap[Int, mutable.BitSet]

  private final val ArrayTag: Byte = 0
  private final val BitmapTag: Byte = 1
  private final val ArrayMax = 4096
  private final val Words = 1024 // 2^16 bits

  private def add(b: Buf, v: Long): Buf = {
    require(v >= 0 && v < (1L << 31), s"bitmap value out of [0, 2^31): $v")
    b.getOrElseUpdate((v >> 16).toInt, mutable.BitSet.empty) += (v & 0xFFFF).toInt
    b
  }

  private def orInto(b1: Buf, b2: Buf): Buf = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foreach { case (hi, bits) =>
      big.get(hi) match {
        case Some(dst) => dst |= bits
        case None      => big(hi) = bits
      }
    }
    big
  }

  /** Deterministic serialization: chunks ascending by high bits; each
    * chunk is its cardinality's cheaper representation.
    */
  private[functions] def serialize(b: Buf): Array[Byte] = {
    val chunks = b.toSeq.sortBy(_._1)
    val size = 4 + chunks.map { case (_, bits) =>
      val c = bits.size
      4 + 1 + 4 + (if (c <= ArrayMax) 2 * c else 8 * Words)
    }.sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(chunks.size)
    chunks.foreach { case (hi, bits) =>
      val c = bits.size
      bb.putInt(hi)
      if (c <= ArrayMax) {
        bb.put(ArrayTag); bb.putInt(c)
        bits.toSeq.sorted.foreach(v => bb.putShort(v.toShort))
      } else {
        bb.put(BitmapTag); bb.putInt(c)
        val words = bits.toBitMask
        var i = 0
        while (i < Words) {
          bb.putLong(if (i < words.length) words(i) else 0L); i += 1
        }
      }
    }
    bb.array()
  }

  private[functions] def deserialize(bytes: Array[Byte]): Buf = {
    val out: Buf = mutable.HashMap.empty
    if (bytes == null || bytes.length < 4) return out
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val hi = bb.getInt
      val tag = bb.get()
      val card = bb.getInt
      val bits =
        if (tag == ArrayTag) {
          val s = mutable.BitSet.empty
          (0 until card).foreach(_ => s += (bb.getShort & 0xFFFF))
          s
        } else {
          val words = new Array[Long](Words)
          (0 until Words).foreach(i => words(i) = bb.getLong)
          mutable.BitSet.fromBitMask(words)
        }
      out(hi) = bits
    }
    out
  }

  // ---- aggregates ----------------------------------------------------

  class BitmapStateAggregator
      extends Aggregator[java.lang.Long, Buf, Array[Byte]] {
    override def zero: Buf = mutable.HashMap.empty
    // NULLs are skipped (boxed input encoder — a primitive Long encoder
    // would AssertNotNull and fail the query on the first NULL)
    override def reduce(b: Buf, v: java.lang.Long): Buf =
      if (v == null) b else add(b, v.longValue())
    override def merge(b1: Buf, b2: Buf): Buf = orInto(b1, b2)
    override def finish(b: Buf): Array[Byte] = serialize(b)
    override def bufferEncoder = Encoders.kryo[Buf]
    override def outputEncoder = Encoders.BINARY
  }

  class BitmapCardAggregator extends Aggregator[java.lang.Long, Buf, Long] {
    override def zero: Buf = mutable.HashMap.empty
    override def reduce(b: Buf, v: java.lang.Long): Buf =
      if (v == null) b else add(b, v.longValue())
    override def merge(b1: Buf, b2: Buf): Buf = orInto(b1, b2)
    override def finish(b: Buf): Long = b.valuesIterator.map(_.size.toLong).sum
    override def bufferEncoder = Encoders.kryo[Buf]
    override def outputEncoder = Encoders.scalaLong
  }

  /** OR-merge of persisted states — the `groupBitmapMergeState` /
    * `groupBitmapOrState` combinator over a binary state column.
    */
  class BitmapMergeAggregator extends Aggregator[Array[Byte], Buf, Array[Byte]] {
    override def zero: Buf = mutable.HashMap.empty
    override def reduce(b: Buf, v: Array[Byte]): Buf =
      if (v == null) b else orInto(b, deserialize(v))
    override def merge(b1: Buf, b2: Buf): Buf = orInto(b1, b2)
    override def finish(b: Buf): Array[Byte] = serialize(b)
    override def bufferEncoder = Encoders.kryo[Buf]
    override def outputEncoder = Encoders.BINARY
  }

  /** groupBitmapState(x): persistable bitmap of the group's values. */
  def groupBitmapState(c: Column): Column =
    udaf(new BitmapStateAggregator, Encoders.LONG).apply(c.cast("long"))

  /** groupBitmap(x): distinct count via the bitmap (exact). */
  def groupBitmap(c: Column): Column =
    udaf(new BitmapCardAggregator, Encoders.LONG).apply(c.cast("long"))

  /** bitmapMergeState over a binary state column. */
  def groupBitmapMergeState(c: Column): Column =
    udaf(new BitmapMergeAggregator, Encoders.BINARY).apply(c)

  // ---- scalar set algebra over states --------------------------------
  // These run on per-GROUP binary states (a few rows post-aggregation),
  // not on the per-row hot path — plain Scala UDFs are the right cost
  // tier here; the per-row work above stays in codegen'd aggregation.

  private def card(b: Buf): Long = b.valuesIterator.map(_.size.toLong).sum

  val bitmapCardinality = udf((a: Array[Byte]) => card(deserialize(a)))

  val bitmapAndCardinality = udf((a: Array[Byte], b: Array[Byte]) => {
    val x = deserialize(a); val y = deserialize(b)
    val (small, big) = if (x.size <= y.size) (x, y) else (y, x)
    small.iterator.map { case (hi, bits) =>
      big.get(hi).map(o => (bits & o).size.toLong).getOrElse(0L)
    }.sum
  })

  val bitmapOrCardinality = udf((a: Array[Byte], b: Array[Byte]) =>
    card(orInto(deserialize(a), deserialize(b))))

  val bitmapXorCardinality = udf((a: Array[Byte], b: Array[Byte]) => {
    val x = deserialize(a); val y = deserialize(b)
    (x.keySet ++ y.keySet).iterator.map { hi =>
      (x.getOrElse(hi, mutable.BitSet.empty) ^
        y.getOrElse(hi, mutable.BitSet.empty)).size.toLong
    }.sum
  })

  val bitmapAndnotCardinality = udf((a: Array[Byte], b: Array[Byte]) => {
    val x = deserialize(a); val y = deserialize(b)
    x.iterator.map { case (hi, bits) =>
      y.get(hi).map(o => (bits &~ o).size.toLong).getOrElse(bits.size.toLong)
    }.sum
  })

  val bitmapContains = udf((a: Array[Byte], v: Long) => {
    val x = deserialize(a)
    v >= 0 && v < (1L << 31) &&
      x.get((v >> 16).toInt).exists(_.contains((v & 0xFFFF).toInt))
  })

  /** bitmapToArray — sorted values (spec/debug; bounded use only). */
  val bitmapToArray = udf((a: Array[Byte]) => {
    deserialize(a).toSeq.sortBy(_._1).flatMap { case (hi, bits) =>
      bits.toSeq.sorted.map(lo => (hi.toLong << 16) | lo)
    }
  })
}
