package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * Image payloads are decoded by a REAL codec ([[ImageCodec]], on the
  * JDK's `javax.imageio` — PNG/JPEG/BMP/GIF): true width/height/format,
  * real pixel stats, real bilinear resampling. Audio payloads are decoded
  * by a REAL RIFF/WAVE PCM codec ([[AudioCodec]]): true
  * rate/channels/frames plus RMS/peak/zero-crossing features. Payloads
  * that are neither (video containers, arbitrary bytes) fall back to
  * [[byteMetaFallback]] — deterministic byte-derived metadata — because
  * this container ships no video demuxer; swapping in one (JavaCV,
  * ffmpeg-pipe) replaces only that function, the distributed plumbing is
  * identical.
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

  /** Fallback metadata for payloads the image codec rejects (audio/video
    * containers — no JDK demuxer — and arbitrary bytes): deterministic
    * byte-derived pseudo-metadata, so the batch map stays row-preserving
    * over mixed binary columns.
    */
  def byteMetaFallback(payload: Array[Byte]): (Int, Int, Long, Long) = {
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
    *
    * Image payloads get REAL decoded values ([[ImageCodec.decode]]):
    * `dec_width`/`dec_height` are the image's true dimensions and
    * `dec_format` its sniffed container format. Non-image payloads get
    * [[byteMetaFallback]] metadata and a null `dec_format`.
    */
  def withDecodedMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema
      .add("dec_width", IntegerType)
      .add("dec_height", IntegerType)
      .add("dec_bytes", LongType)
      .add("dec_duration_ms", LongType)
      .add("dec_format", StringType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        ImageCodec.decode(p) match {
          case Some(d) =>
            Row.fromSeq(r.toSeq ++ Seq(Int.box(d.width), Int.box(d.height),
              Long.box(p.length.toLong), null, d.format))
          case None =>
            val (w, h, n, dur) = byteMetaFallback(p)
            Row.fromSeq(r.toSeq ++ Seq(Int.box(w), Int.box(h), Long.box(n),
              Long.box(dur), null))
        }
      }
    }(Encoders.row(schema))
  }

  /** Real decoded-pixel statistics per image: true dimensions, format,
    * and exact min/max/sum over the 8-bit pixel samples — all null for
    * payloads the codec rejects. Integer stats make the whole
    * decode path oracle-checkable when image content is deterministic.
    */
  def decodedPixelStats(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema
      .add("dec_width", IntegerType)
      .add("dec_height", IntegerType)
      .add("dec_format", StringType)
      .add("px_min", IntegerType)
      .add("px_max", IntegerType)
      .add("px_sum", LongType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        ImageCodec.decode(p) match {
          case Some(d) =>
            var mn = 255; var mx = 0; var sum = 0L
            var i = 0
            while (i < d.pixels.length) {
              val v = d.pixels(i)
              if (v < mn) mn = v
              if (v > mx) mx = v
              sum += v
              i += 1
            }
            Row.fromSeq(r.toSeq ++ Seq(Int.box(d.width), Int.box(d.height),
              d.format, Int.box(mn), Int.box(mx), Long.box(sum)))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null))
        }
      }
    }(Encoders.row(schema))
  }

  /** Real decoded-audio statistics per clip ([[AudioCodec]] RIFF/PCM
    * parse): true rate/channels/frames plus the curation features (peak,
    * RMS, channel-0 zero crossings) — all null for payloads the codec
    * rejects. Same per-partition batch shape as [[decodedPixelStats]];
    * integer-friendly features make the path oracle-checkable on
    * deterministic fixtures.
    */
  def audioClipStats(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema
      .add("sample_rate", IntegerType)
      .add("channels", IntegerType)
      .add("bits", IntegerType)
      .add("n_frames", LongType)
      .add("duration_ms", LongType)
      .add("peak", IntegerType)
      .add("rms", DoubleType)
      .add("zero_crossings", LongType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        AudioCodec.decode(p) match {
          case Some(d) =>
            Row.fromSeq(r.toSeq ++ Seq(
              Int.box(d.meta.sampleRate), Int.box(d.meta.channels),
              Int.box(d.meta.bitsPerSample), Long.box(d.meta.nFrames.toLong),
              Long.box(d.meta.durationMs), Int.box(AudioCodec.peak(d)),
              Double.box(AudioCodec.rms(d)),
              Long.box(AudioCodec.zeroCrossings(d))))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null,
              null, null))
        }
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

  /** REAL image resize, per-partition batched like [[withDecodedMeta]]:
    * decode → bilinear resample ([[ImageCodec.resizeBilinear]]) →
    * re-encode as PNG. `resized` is null for payloads the codec rejects
    * (no fake bytes — a training pipeline filters those rows).
    */
  def withResized(df: DataFrame, targetW: Int, targetH: Int,
                  payloadCol: String = "payload"): DataFrame = {
    val base = df.schema
      .add("resized", BinaryType)
      .add("res_w", IntegerType)
      .add("res_h", IntegerType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val resized = ImageCodec.decode(p).map { d =>
          ImageCodec.encodePngPixels(targetW, targetH,
            ImageCodec.resizeBilinear(d, targetW, targetH))
        }.orNull
        Row.fromSeq(r.toSeq ++ Seq(resized, Int.box(targetW), Int.box(targetH)))
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
        Row.fromSeq(r.toSeq :+ l2Normalize(hist))
      }
    }(Encoders.row(base))
  }

  /** Pixel-histogram embedding over REAL decoded pixels: the 16-bucket
    * histogram of 8-bit pixel samples, L2-normalized — content features,
    * not container-byte features (two encodings of the same image get the
    * same embedding; [[byteHistogramFeatures]] would not). Non-image
    * payloads fall back to the byte histogram so mixed columns still
    * produce a usable vector. Compatible with the embedding dedup / ANN
    * family (`Dedup.embeddingNearDupPairsLsh`, `SimilaritySearch.*`).
    */
  def pixelHistogramFeatures(df: DataFrame,
                             payloadCol: String = "payload",
                             outCol: String = "features"): DataFrame = {
    val base = df.schema.add(outCol, ArrayType(FloatType))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = if (r.isNullAt(idx)) Array.emptyByteArray
                else r.getAs[Array[Byte]](idx)
        val hist = new Array[Float](16)
        ImageCodec.decode(p) match {
          case Some(d) =>
            var i = 0
            while (i < d.pixels.length) { hist(d.pixels(i) >> 4) += 1f; i += 1 }
          case None =>
            var i = 0
            while (i < p.length) { hist((p(i) & 0xff) >> 4) += 1f; i += 1 }
        }
        Row.fromSeq(r.toSeq :+ l2Normalize(hist))
      }
    }(Encoders.row(base))
  }

  private def l2Normalize(hist: Array[Float]): Seq[Float] = {
    var ss = 0.0
    hist.foreach(x => ss += x * x)
    val n = if (ss == 0) 1f else math.sqrt(ss).toFloat
    hist.map(_ / n).toSeq
  }
}
