package graft.misc

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.mergetree.{ProjectionDef, Projections}
import graft.multimodal.Multimodal
import graft.operators.{SetJoinEngines, WithFill}
import graft.tables.Tables

class MiscModulesSpec extends SparkSpec {
  import spark.implicits._

  test("WithFill densifies a sparse integer axis") {
    val df = Seq((1L, 10L), (4L, 40L)).toDF("x", "n")
    val filled = WithFill.fillLongs(df, "x", Seq("n" -> lit(0L)))
    val m = filled.as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 10L, 2L -> 0L, 3L -> 0L, 4L -> 40L))
  }

  test("SetEngine: broadcast IN / NOT IN") {
    val keys = Seq(1L, 3L).toDF("k")
    val data = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val eng = SetJoinEngines.SetEngine.build(keys, "k")
    assert(eng.filterIn(data, col("id")).count() == 2)
    assert(eng.filterNotIn(data, col("id")).count() == 1)
    val flags = data.select(eng.contains(col("id"))).as[Boolean].collect()
    assert(flags.count(identity) == 2)
  }

  test("JoinEngine joinGet point lookup") {
    val dim = Seq((1L, "one"), (2L, "two")).toDF("k", "name")
    val eng = new SetJoinEngines.JoinEngine(dim, "k")
    val out = Seq(1L, 2L, 9L).toDF("k")
      .select(eng.joinGet("name")(col("k")).as("n")).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("one"), Some("two"), None))
  }

  test("projection materialize + route equals direct aggregation") {
    val root = Files.createTempDirectory("graft_proj").toString
    val li = Tables(spark, sfDir).lineitem
      .select($"l_returnflag", $"l_linestatus",
        (col("l_quantity") * 100).cast("long").as("qty_c"))
    val p = ProjectionDef("by_flag_status", Seq("l_returnflag", "l_linestatus"),
      Seq("qty_c"), s"$root/proj")
    Projections.materialize(li, p)
    // narrower grouping answered FROM the projection
    val routed = Projections.route(spark, p, Seq("l_returnflag"), Seq("qty_c"))
      .select($"l_returnflag", $"cnt", $"sum_qty_c")
      .as[(String, Long, Long)].collect().toMap2
    val direct = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum($"qty_c").as("s"))
      .as[(String, Long, Long)].collect().toMap2
    assert(routed == direct)
  }

  test("row policies filter per principal, OR-combined, pass-through otherwise") {
    val rp = new graft.operators.RowPolicies
    val df = Seq((1, "eu"), (2, "us"), (3, "eu"), (4, "apac")).toDF("id", "region")
    rp.create("t", "analyst_eu", col("region") === "eu")
    rp.create("t", "analyst_eu", col("id") === 4) // second policy ORs in
    assert(rp.readAs(df, "t", "analyst_eu").count() == 3)
    assert(rp.readAs(df, "t", "admin").count() == 4) // no policy → all rows
    rp.drop("t", "analyst_eu")
    assert(rp.readAs(df, "t", "analyst_eu").count() == 4)
  }

  test("column TTL resets expired values, keeps rows") {
    val dir = Files.createTempDirectory("graft_colttl").toString + "/t"
    val now = java.sql.Timestamp.valueOf("2024-06-30 00:00:00")
    (1 to 20).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-06-${i % 28 + 1}%02d 12:00:00"), s"secret$i")
    }.toDF("id", "ts", "payload").write.mode("overwrite").parquet(dir)
    graft.mergetree.Mutations.applyColumnTtl(spark, dir, "ts", "payload",
      lit(""), retainDays = 7, now = now)
    val out = spark.read.parquet(dir)
    assert(out.count() == 20) // rows survive
    assert(out.filter($"payload" === "").count() > 0)
    assert(out.filter($"ts" >= lit("2024-06-23 00:00:00") && $"payload" === "").count() == 0)
  }

  test("multimodal decode: real images get true dims/format, others fall back; frames explode") {
    import graft.multimodal.ImageCodec
    val png = ImageCodec.encodePng(37, 21, (x, y) => (x * 3 + y * 5) % 256)
    val media = Seq(
      (1L, "image", png),
      (2L, "video", ("x" * 4096).getBytes),
      (3L, "blob", "abcdef".getBytes))
      .toDF("media_id", "kind", "payload")
    val dec = Multimodal.withDecodedMeta(media)
    assert(dec.count() == 3)
    // real decode: true dimensions + sniffed format, not byte formulas
    val ri = dec.filter($"media_id" === 1)
      .select("dec_width", "dec_height", "dec_format", "dec_bytes").head()
    assert(ri.getInt(0) == 37 && ri.getInt(1) == 21 && ri.getString(2) == "png")
    assert(ri.getLong(3) == png.length.toLong)
    // non-image: byte-derived fallback metadata, null format
    val rf = dec.filter($"media_id" === 3)
      .select("dec_bytes", "dec_width", "dec_format").head()
    assert(rf.getLong(0) == 6L)
    val (w, _, _, _) = Multimodal.byteMetaFallback("abcdef".getBytes)
    assert(rf.getInt(1) == w && rf.isNullAt(2))
    val frames = Multimodal.sampleFrames(media.filter($"media_id" === 2), "payload",
      everyNth = 2, frameBytes = 1024)
    assert(frames.count() == 2) // 4 frames, every 2nd
  }

  test("image codec roundtrip: pixels survive PNG encode/decode; bilinear resize is real") {
    import graft.multimodal.ImageCodec
    val px = Array.tabulate(24 * 16)(i => (i * 7) % 256)
    val d = ImageCodec.decode(ImageCodec.encodePngPixels(24, 16, px)).get
    assert(d.width == 24 && d.height == 16 && d.format == "png")
    assert(d.pixels.sameElements(px)) // lossless roundtrip, raw samples
    // bilinear: constant stays constant; a gradient resamples to interior values
    val const = ImageCodec.Decoded(10, 10, "png", Array.fill(100)(77))
    assert(ImageCodec.resizeBilinear(const, 4, 3).forall(_ == 77))
    val grad = ImageCodec.Decoded(3, 1, "png", Array(0, 100, 200))
    assert(ImageCodec.resizeBilinear(grad, 5, 1).toSeq == Seq(0, 50, 100, 150, 200))
  }

  test("multimodal resize decodes, resamples and re-encodes; null for non-images") {
    import graft.multimodal.ImageCodec
    val media = Seq(
      (1L, "image", ImageCodec.encodePng(40, 30, (x, y) => (x + y) % 256)),
      (2L, "blob", "not an image".getBytes))
      .toDF("media_id", "kind", "payload")
    val res = Multimodal.withResized(media, 64, 64)
    val r1 = res.filter($"media_id" === 1).select("resized", "res_w", "res_h").head()
    val out = ImageCodec.decode(r1.getAs[Array[Byte]](0)).get
    assert(out.width == 64 && out.height == 64 && out.format == "png")
    assert(r1.getInt(1) == 64 && r1.getInt(2) == 64)
    assert(res.filter($"media_id" === 2).select("resized").head().isNullAt(0))
  }

  test("pixel-histogram features on real decoded images feed the embedding dedup family") {
    import graft.multimodal.ImageCodec
    val basePx = Array.tabulate(64 * 64)(i => (i % 251))
    val tweaked = basePx.clone(); tweaked(0) = (tweaked(0) + 8) % 256
    val media = Seq(
      (1L, "image", ImageCodec.encodePngPixels(64, 64, basePx)),
      (2L, "image", ImageCodec.encodePngPixels(64, 64, tweaked)), // near-identical pixels
      (3L, "image", ImageCodec.encodePng(64, 64, (_, _) => 7)))   // degenerate histogram
      .toDF("media_id", "kind", "payload")
    val feat = Multimodal.pixelHistogramFeatures(media)
    // near-identical decoded CONTENT → cosine ~1 through the real extractor
    val pairs = graft.operators.Dedup.embeddingNearDupPairsLsh(
        feat.select($"media_id", $"features"), "media_id", "features",
        minCosine = 0.99, bits = 4, tables = 2)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-identical media not paired: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // byte-histogram variant still works for mixed/opaque payloads
    assert(Multimodal.byteHistogramFeatures(media).count() == 3)
  }

  test("LimitBy keeps the first n per key in order, with CH offset form") {
    import graft.operators.LimitBy
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8), ("c", 5))
      .toDF("k", "v")
    val top2 = LimitBy.limitBy(df, 2, Seq($"k"), Seq($"v".desc))
      .as[(String, Int)].collect().toSet
    assert(top2 == Set(("a", 3), ("a", 2), ("b", 9), ("b", 8), ("c", 5)))
    // LIMIT 1, 2 BY k — skip the first row of each group, take next 2
    val off = LimitBy.limitBy(df, 2, Seq($"k"), Seq($"v".desc), offset = 1)
      .as[(String, Int)].collect().toSet
    assert(off == Set(("a", 2), ("a", 1), ("b", 8)))
  }

  private implicit class Tup3Ops[A, B, C](xs: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = xs.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
