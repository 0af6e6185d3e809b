package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("build/mightContain: zero false negatives, bounded false positives") {
    val keys = (0L until 2000L).map(i => s"key-$i").toDF("k")
    val bits = BloomPrune.optimalNumBits(2000, 0.01)
    val blob = BloomPrune.build(keys, $"k", 2000, bits)
    // every inserted key tests positive
    val misses = keys.filter(!BloomPrune.mightContain(blob, $"k")).count()
    assert(misses == 0)
    // absent keys: fpp around 1%, allow generous slack
    val absent = (0L until 2000L).map(i => s"other-$i").toDF("k")
    val fps = absent.filter(BloomPrune.mightContain(blob, $"k")).count()
    assert(fps < 100, s"false positives $fps / 2000")
  }

  test("merge is union; write/read round-trips params") {
    val bits = BloomPrune.optimalNumBits(100, 0.01)
    val a = BloomPrune.build(Seq("a1", "a2").toDF("k"), $"k", 100, bits)
    val b = BloomPrune.build(Seq("b1").toDF("k"), $"k", 100, bits)
    val m = BloomPrune.merge(a, b)
    val probe = Seq("a1", "a2", "b1").toDF("k")
    assert(probe.filter(!BloomPrune.mightContain(m, $"k")).count() == 0)
    val path = Files.createTempDirectory("graft_bloom").toString + "/_bloom.bin"
    BloomPrune.write(spark, path, m, 100, bits)
    val Some((back, items, gotBits)) = BloomPrune.read(spark, path)
    assert(items == 100 && gotBits == bits && back.sameElements(m))
    assert(BloomPrune.read(spark, path + ".missing").isEmpty)
  }

  test("incremental dedup with bloom routing matches the exact path") {
    def docs(ids: Range, dup: Map[Long, String] = Map.empty) =
      ids.map(i => (i.toLong, dup.getOrElse(i.toLong, s"text body $i"))).toDF("doc_id", "text")

    val storeA = Files.createTempDirectory("graft_bloom_inc").toString + "/store"
    val storeB = Files.createTempDirectory("graft_bloom_inc").toString + "/store"

    // increment 1: internal dup (2 copies of "shared"); increment 2:
    // cross-increment dups against 1 plus fresh rows
    val inc1 = docs(0 until 50, Map(7L -> "shared", 9L -> "shared"))
    val inc2 = docs(50 until 100,
      Map(60L -> "shared", 61L -> "text body 3", 62L -> "text body 11"))

    val a1 = Dedup.incrementalExactDedup(inc1, "doc_id", "text", storeA, "i1")
      .select("doc_id").as[Long].collect().sorted
    val a2 = Dedup.incrementalExactDedup(inc2, "doc_id", "text", storeA, "i2")
      .select("doc_id").as[Long].collect().sorted

    val b1 = Dedup.incrementalExactDedup(inc1, "doc_id", "text", storeB, "i1",
        bloomExpectedItems = 1000)
      .select("doc_id").as[Long].collect().sorted
    val b2 = Dedup.incrementalExactDedup(inc2, "doc_id", "text", storeB, "i2",
        bloomExpectedItems = 1000)
      .select("doc_id").as[Long].collect().sorted

    assert(b1.toSeq == a1.toSeq)
    assert(b2.toSeq == a2.toSeq)
    assert(!b2.contains(60L) && !b2.contains(61L) && !b2.contains(62L))

    // the blob exists, does not break store reads, and covers the store
    assert(BloomPrune.read(spark, s"$storeB/_bloom.bin").isDefined)
    val storeFps = spark.read.parquet(storeB).select("fingerprint")
    val Some((blob, _, _)) = BloomPrune.read(spark, s"$storeB/_bloom.bin")
    assert(storeFps.filter(
      !BloomPrune.mightContain(blob, col("fingerprint"))).count() == 0)

    // replay increment 2: same survivors, bloom still consistent
    val b2r = Dedup.incrementalExactDedup(inc2, "doc_id", "text", storeB, "i2",
        bloomExpectedItems = 1000)
      .select("doc_id").as[Long].collect().sorted
    assert(b2r.toSeq == b2.toSeq)
  }

  test("near-dup incremental dedup: bloom parity, retention, gated probe plan") {
    // id-stamped tokens: distinct docs share ZERO shingles (jaccard 0,
    // never collide); `tail` is a one-token edit of `base` (jaccard
    // 17/19 ≈ 0.9, 16-band miss prob ~5e-8 — and the hashes are
    // deterministic, so the survivor set is FIXED for these texts)
    def base(s: Long) = (0 until 20).map(t => s"w${t}_$s").mkString(" ")
    def tail(s: Long) = base(s).split(" ").dropRight(1).mkString(" ") + " zz"
    def docs(ids: Range, text: Map[Long, String] = Map.empty) =
      ids.map(i => (i.toLong, text.getOrElse(i.toLong, base(i.toLong))))
        .toDF("doc_id", "text")
    val storeA = Files.createTempDirectory("graft_bloom_nd").toString + "/store"
    val storeB = Files.createTempDirectory("graft_bloom_nd").toString + "/store"
    val inc1 = docs(0 until 40, Map(7L -> tail(5))) // 7 near-dups 5 in-batch
    // 50 exact-dups kept history doc 5; 51 exact-dups DROPPED history doc
    // 7 — covered because the store keeps dropped docs' buckets too
    val inc2 = docs(40 until 80, Map(50L -> base(5), 51L -> tail(5)))
    def run(store: String, inc: org.apache.spark.sql.DataFrame, id: String,
            bloom: Long): Seq[Long] =
      Dedup.incrementalNearDedup(inc, "doc_id", "text", store, id,
          bloomExpectedItems = bloom)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val a1 = run(storeA, inc1, "i1", 0L); val b1 = run(storeB, inc1, "i1", 4096L)
    val a2 = run(storeA, inc2, "i2", 0L); val b2 = run(storeB, inc2, "i2", 4096L)
    assert(b1 == a1 && b2 == a2, "bloom routing changed the survivor set")
    assert(!b1.contains(7L) && b1.contains(5L))
    assert(!b2.contains(50L) && !b2.contains(51L) && b2.size == 38)
    // replay the routed increment: identical survivors (idempotence)
    assert(run(storeB, inc2, "i2", 4096L) == b2)
    // the blob covers every (band, bh) key in the store — no false negatives
    val Some((blob, _, _)) = BloomPrune.read(spark, s"$storeB/_bloom.bin")
    val storeKeys = spark.read.parquet(storeB).select(col("band"), col("bh"))
    assert(storeKeys.filter(!BloomPrune.mightContain(blob,
      struct(col("band"), col("bh")))).count() == 0)
    // plan audit: the history semi-join's PROBE side is gated by the
    // bloom predicate (filter sits below the join, map-side)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join => LJoin}
    // non-local inputs (range + the real parquet store) so the optimizer
    // cannot constant-fold the join away before we inspect it
    val bk = spark.range(100).selectExpr("id AS doc_id",
      "CAST(id % 16 AS int) AS band", "CAST(id * 7 AS int) AS bh")
    val hist = spark.read.parquet(storeB).select(col("band"), col("bh"))
    val probe = Dedup.nearDupHistProbe(bk, hist, Some(blob), "doc_id")
    val join = probe.queryExecution.optimizedPlan.collectFirst { case j: LJoin => j }
    assert(join.isDefined, "no join in probe plan")
    val gated = join.get.left.collectFirst {
      case f: LFilter if f.condition.toString.toLowerCase.contains("might_contain") => f
    }
    assert(gated.isDefined, "store semi-join probe not gated by might_contain:\n" +
      probe.queryExecution.optimizedPlan)
  }

  test("bloom enabled on a PRE-EXISTING store backfills history keys") {
    val store = Files.createTempDirectory("graft_bloom_bf").toString + "/store"
    val inc1 = (0 until 30).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    // first increment WITHOUT bloom — store exists, no blob
    Dedup.incrementalExactDedup(inc1, "doc_id", "text", store, "i1").count()
    assert(BloomPrune.read(spark, s"$store/_bloom.bin").isEmpty)
    // second increment turns bloom on: blob must cover increment 1's keys
    val inc2 = (30 until 60).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    Dedup.incrementalExactDedup(inc2, "doc_id", "text", store, "i2",
      bloomExpectedItems = 1000).count()
    val Some((blob, _, _)) = BloomPrune.read(spark, s"$store/_bloom.bin")
    val allFps = spark.read.parquet(store).select("fingerprint")
    assert(allFps.count() == 60)
    assert(allFps.filter(
      !BloomPrune.mightContain(blob, col("fingerprint"))).count() == 0)
  }
}
