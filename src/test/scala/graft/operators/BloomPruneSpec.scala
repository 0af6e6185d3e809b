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
