package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark side — schema, partitioning, per-partition batch shape,
  * row-preserving decode — is real and tested. The media decoding itself
  * is a STUB (this container has no image/audio codecs): [[decodeStub]]
  * derives deterministic fake metadata from the payload bytes. Swapping in
  * a real decoder (JavaCV, TwelveMonkeys, ffmpeg-pipe) only replaces that
  * one function; the distributed plumbing is unchanged.
  */
object Multimodal {

  /** Canonical media table schema: id + kind + opaque payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** STUB decoder: deterministic pseudo-metadata from payload bytes.
    * A real deployment replaces this body with an actual codec call.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long, Long) = {
    if (payload == null || payload.isEmpty) (0, 0, 0L, 0L)
    else {
      val n = payload.length.toLong
      val first = payload(0) & 0xff
      val width = 64 + ((n + first) % 1856).toInt   // fake 64..1920
      val height = 64 + ((n * 7 + first) % 1016).toInt
      (width, height, n, n * 3)                     // fake duration
    }
  }

  /** Attach decoded metadata to a media DataFrame. Runs as a per-partition
    * batch map (the Scala analogue of mapInPandas): no shuffle, preserves
    * partitioning, one decoder instance per partition — the shape a real
    * codec needs (native init amortized across the batch).
    */
  def withDecodedMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema
      .add("dec_width", IntegerType)
      .add("dec_height", IntegerType)
      .add("dec_bytes", LongType)
      .add("dec_duration_ms", LongType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (native lib handle)
      rows.map { r =>
        val (w, h, n, d) = decodeStub(
          if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ Seq(Int.box(w), Int.box(h), Long.box(n), Long.box(d)))
      }
    }(Encoders.row(schema))
  }

  /** Frame sampling stub for video payloads: every `everyNth` fake frame
    * (chunks of `frameBytes`), exploded to one row per sampled frame.
    * Real implementation: demux + keyframe extraction in the partition map.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, everyNth: Int,
                   frameBytes: Int = 1024): DataFrame = {
    val base = df.schema
      .add("frame_idx", IntegerType)
      .add("frame", BinaryType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(idx)) Array.emptyByteArray
                      else r.getAs[Array[Byte]](idx)
        val nFrames = payload.length / frameBytes
        (0 until nFrames by everyNth).map { f =>
          Row.fromSeq(r.toSeq ++ Seq(f,
            payload.slice(f * frameBytes, (f + 1) * frameBytes)))
        }
      }
    }(Encoders.row(base))
  }

  /** Byte-level features computable WITHOUT a codec — pure columnar ops
    * (octet length, leading byte, simple checksums) for filtering/bucketing
    * media at scan speed before any expensive decode.
    */
  def byteFeatures(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      octet_length(payload).as("n_bytes"),
      crc32(payload).as("crc"),
      substring(hex(payload), 0, 8).as("magic"))

  /** Resize, per-partition batched like [[withDecodedMeta]]. The pixel
    * resample is the STUB (`resizeStub` — deterministic byte subsampling);
    * everything Spark-side is real: binary-in/binary-out schema, one
    * "codec" per partition, new dimensions attached. A real implementation
    * replaces only the inner function.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(payload.length, w * h / 64))
    val step = math.max(1, payload.length / target)
    payload.grouped(step).map(_.head).toArray.take(target)
  }

  def withResized(df: DataFrame, targetW: Int, targetH: Int,
                  payloadCol: String = "payload"): DataFrame = {
    val base = df.schema
      .add("resized", BinaryType)
      .add("res_w", IntegerType)
      .add("res_h", IntegerType)
    df.mapPartitions { rows =>
      // per-partition scaler init would go here (native lib handle)
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadCol)
        Row.fromSeq(r.toSeq ++ Seq(resizeStub(p, targetW, targetH), targetW, targetH))
      }
    }(Encoders.row(base))
  }

  /** Byte-histogram embedding — a REAL (non-stub) feature extractor: the
    * 16-bucket byte-value histogram, L2-normalized, as `Array[Float]`.
    * Codec-free, deterministic, and compatible with the embedding dedup /
    * ANN family (`Dedup.embeddingNearDupPairsLsh`,
    * `SimilaritySearch.*`) — near-identical payloads get cosine ≈ 1.
    */
  def byteHistogramFeatures(df: DataFrame,
                            payloadCol: String = "payload",
                            outCol: String = "features"): DataFrame = {
    val base = df.schema.add(outCol, ArrayType(FloatType))
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadCol)
        val hist = new Array[Float](16)
        var i = 0
        while (i < p.length) { hist((p(i) & 0xff) >> 4) += 1f; i += 1 }
        var ss = 0.0
        hist.foreach(x => ss += x * x)
        val n = if (ss == 0) 1f else math.sqrt(ss).toFloat
        Row.fromSeq(r.toSeq :+ hist.map(_ / n).toSeq)
      }
    }(Encoders.row(base))
  }
}
