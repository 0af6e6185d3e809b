package graft.misc

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.{AudioCodec, Multimodal}

class AudioCodecSpec extends SparkSpec {
  import spark.implicits._
  import AudioCodec._

  test("encode/decode roundtrip preserves meta and samples, with and without extra chunks") {
    val samples = Array.tabulate(480)(i => (math.sin(i * 0.1) * 8000).toShort)
    for (extra <- Seq(false, true)) {
      val bytes = encodeWavPcm16(16000, 1, samples, extraChunk = extra)
      val d = decode(bytes).get
      assert(d.meta == WavMeta(16000, 1, 16, 480))
      assert(d.samples.toSeq == samples.toSeq)
      assert(d.meta.durationMs == 30L)
    }
  }

  test("stereo interleave: nFrames counts frames, features read channel 0") {
    // L channel: +A/-A square (period 4); R channel: constant 100
    val a: Short = 5000
    val samples = Array.tabulate(200 * 2) { k =>
      if (k % 2 == 0) { if ((k / 2 / 2) % 2 == 0) a else (-a).toShort }
      else 100.toShort
    }
    val d = decode(encodeWavPcm16(8000, 2, samples)).get
    assert(d.meta.channels == 2 && d.meta.nFrames == 200)
    assert(peak(d) == 5000)
    // 200 frames, flip every 2 frames → 99 crossings on channel 0
    assert(zeroCrossings(d) == 99L)
  }

  test("decode rejects garbage, truncation, and non-PCM") {
    assert(decode(null).isEmpty)
    assert(decode(Array[Byte](1, 2, 3)).isEmpty)
    val good = encodeWavPcm16(8000, 1, Array.tabulate(64)(_.toShort))
    assert(decode(good.take(30)).isEmpty) // truncated inside fmt/data
    val nonPcm = good.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float
    assert(decode(nonPcm).isEmpty)
    // flipped data-size beyond buffer
    val badSize = good.clone()
    badSize(good.length - 64 * 2 - 1) = 0x7F
    assert(decode(badSize).isEmpty)
  }

  test("frames windows: fixed hop, tail dropped, channel-0 only") {
    val samples = Array.tabulate(20)(i => i.toShort)
    val d = decode(encodeWavPcm16(8000, 1, samples)).get
    val fs = frames(d, frameLen = 8, hop = 4)
    assert(fs.length == 4)
    assert(fs(0).toSeq == (0 until 8).map(_.toShort))
    assert(fs(3).toSeq == (12 until 20).map(_.toShort))
  }

  test("audioClipStats decodes distributed payloads and nulls rejects") {
    val mk = udf { (id: Long) =>
      if (id == 3L) Array[Byte](9, 9, 9)
      else encodeWavPcm16(8000, 1,
        Array.fill(80)(if (id % 2 == 0) 1000.toShort else 2000.toShort))
    }
    val df = spark.range(5).select($"id", mk($"id").as("payload"))
    val got = Multimodal.audioClipStats(df)
      .select($"id", $"sample_rate", $"rms").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(3L) == ((None, None)))
    assert(got(0L) == ((Some(8000), Some(1000.0))))
    assert(got(1L) == ((Some(8000), Some(2000.0))))
  }
}
