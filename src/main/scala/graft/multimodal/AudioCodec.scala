package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real RIFF/WAVE PCM codec, dependency-free (the audio twin of
  * [[ImageCodec]] — the builder mandate names audio columns first-class
  * and the JDK needs no external lib for WAV): a spec-conformant writer
  * and a chunk-walking reader for 16-bit PCM, plus the frame/feature
  * primitives a curation pipeline computes per clip (RMS, peak, zero
  * crossings, fixed-hop frame windows).
  *
  * The reader walks the chunk list (skipping unknown chunks like LIST or
  * fact, honoring RIFF's odd-size padding byte) rather than assuming the
  * fixed 44-byte header, so real-world files with metadata chunks parse.
  * Non-PCM formats, truncated chunks, and garbage all return None — a
  * corrupt payload must never kill a 100 TB scan.
  */
object AudioCodec {

  final case class WavMeta(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nFrames: Int) {
    def durationMs: Long = nFrames.toLong * 1000L / sampleRate
  }

  final case class DecodedWav(meta: WavMeta, samples: Array[Short])

  def sniffWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E'

  /** 16-bit PCM RIFF writer. `samples` is channel-interleaved; its length
    * must be a multiple of `channels`. `extraChunk` optionally injects a
    * LIST metadata chunk BEFORE data, proving readers chunk-walk.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short],
                     extraChunk: Boolean = false): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"interleave mismatch: ${samples.length} samples, $channels channels")
    val dataLen = samples.length * 2
    val extra = if (extraChunk) 8 + 4 else 0 // "LIST" + size + "INFO"
    val riffLen = 4 + (8 + 16) + extra + (8 + dataLen)
    val bb = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(riffLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort)  // block align
    bb.putShort(16)                      // bits per sample
    if (extraChunk) {
      bb.put("LIST".getBytes("US-ASCII")); bb.putInt(4)
      bb.put("INFO".getBytes("US-ASCII"))
    }
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Chunk-walking 16-bit PCM reader; None on anything malformed. */
  def decode(bytes: Array[Byte]): Option[DecodedWav] = {
    if (!sniffWav(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      bb.position(12)
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[Array[Short]] = None
      while (bb.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(Array(bb.get(), bb.get(), bb.get(), bb.get())
          .map(_.toChar))
        val size = bb.getInt
        if (size < 0 || size > bb.remaining()) return None
        val next = bb.position() + size + (size & 1) // odd sizes pad
        id match {
          case "fmt " =>
            if (size < 16) return None
            val audioFormat = bb.getShort & 0xFFFF
            val channels = bb.getShort & 0xFFFF
            val rate = bb.getInt
            bb.getInt; bb.getShort // byte rate, block align
            val bits = bb.getShort & 0xFFFF
            if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0)
              return None
            fmt = Some((channels, rate, bits))
          case "data" =>
            val n = size / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) { out(i) = bb.getShort; i += 1 }
            data = Some(out)
          case _ => () // LIST, fact, bext... skip
        }
        if (next > bb.limit()) return None
        bb.position(next)
      }
      for ((channels, rate, bits) <- fmt; samples <- data)
        yield {
          if (samples.length % channels != 0) return None
          DecodedWav(WavMeta(rate, channels, bits, samples.length / channels),
            samples)
        }
    } catch { case _: Exception => None }
  }

  // ---- per-clip features (channel 0 unless noted) --------------------

  def peak(d: DecodedWav): Int = {
    var m = 0
    var i = 0
    while (i < d.samples.length) {
      val a = math.abs(d.samples(i).toInt)
      if (a > m) m = a
      i += 1
    }
    m
  }

  /** sqrt(mean(s^2)) over ALL channels' samples. */
  def rms(d: DecodedWav): Double = {
    if (d.samples.isEmpty) return 0.0
    var s = 0.0
    var i = 0
    while (i < d.samples.length) {
      val v = d.samples(i).toDouble
      s += v * v
      i += 1
    }
    math.sqrt(s / d.samples.length)
  }

  /** Sign flips between consecutive channel-0 samples (zero samples
    * carry the previous sign — the standard definition).
    */
  def zeroCrossings(d: DecodedWav): Long = {
    val ch = d.meta.channels
    var n = 0L
    var prev = 0
    var i = 0
    while (i < d.samples.length) {
      val v = d.samples(i).toInt
      val sign = if (v > 0) 1 else if (v < 0) -1 else prev
      if (prev != 0 && sign != 0 && sign != prev) n += 1
      if (sign != 0) prev = sign
      i += ch
    }
    n
  }

  /** Fixed-hop channel-0 frame windows — the "frame-sample" primitive
    * (what a feature extractor consumes). Frames shorter than `frameLen`
    * at the tail are dropped.
    */
  def frames(d: DecodedWav, frameLen: Int, hop: Int): Array[Array[Short]] = {
    require(frameLen > 0 && hop > 0, "frameLen and hop must be positive")
    val ch = d.meta.channels
    val n = d.meta.nFrames
    if (n < frameLen) return Array.empty
    (0 to n - frameLen by hop).map { start =>
      Array.tabulate(frameLen)(j => d.samples((start + j) * ch))
    }.toArray
  }
}
