package graft.mergetree

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkipIndexSpec extends SparkSpec {
  import spark.implicits._

  private def table(dir: String): Unit =
    (0L until 800L).map { i =>
      val tok = if (i == 137L) "zzyzxq" else s"tok${i % 40}"
      (i, s"k${i % 500}", s"cat${i / 100}", s"common words $tok here")
    }.toDF("id", "key", "cat", "text")
      .repartitionByRange(8, $"id")
      .write.parquet(dir)

  test("bloom_filter index prunes files; pruned read equals full filter") {
    val dir = Files.createTempDirectory("graft_skip").toString + "/t"
    table(dir)
    SkipIndex.buildBloom(spark, dir, "key", "bf_key", expectedPerFile = 1000)
    val total = SystemTables.parts(spark, dir).count()
    val survivors = SkipIndex.filesBloomMightContain(spark, dir, "bf_key", "k137")
    assert(survivors.nonEmpty && survivors.size < total,
      s"no pruning: ${survivors.size} of $total files")
    val pruned = SkipIndex.readPruned(spark, dir, survivors)
      .filter($"key" === "k137").select("id").as[Long].collect().sorted
    val full = spark.read.parquet(dir)
      .filter($"key" === "k137").select("id").as[Long].collect().sorted
    assert(pruned.toSeq == full.toSeq && full.nonEmpty)
  }

  test("bloom probe is width-agnostic: IntegerType column probed with Long/Int/String never falsely prunes") {
    val dir = Files.createTempDirectory("graft_skip").toString + "/t"
    (0 until 800).map(i => (i, i % 100)).toDF("id", "num")
      .repartitionByRange(8, $"id").write.parquet(dir)
    SkipIndex.buildBloom(spark, dir, "num", "bf_num", expectedPerFile = 1000)
    // both sides hash the canonical string form, so the probe's Scala
    // numeric width must not matter — a native-type hash would prune
    // EVERY file here (silent row loss)
    for (probe <- Seq[Any](42L, 42, "42")) {
      val survivors = SkipIndex.filesBloomMightContain(spark, dir, "bf_num", probe)
      val full = spark.read.parquet(dir).filter($"num" === 42)
        .select("id").as[Long].collect().sorted
      val pruned = SkipIndex.readPruned(spark, dir, survivors)
        .filter($"num" === 42).select("id").as[Long].collect().sorted
      assert(full.nonEmpty && pruned.toSeq == full.toSeq,
        s"probe $probe (${probe.getClass.getSimpleName}) lost rows")
    }
  }

  test("tokenbf index: token probe prunes to the planting file") {
    val dir = Files.createTempDirectory("graft_skip").toString + "/t"
    table(dir)
    SkipIndex.buildTokenBloom(spark, dir, "text", "tbf", expectedPerFile = 10000)
    val survivors = SkipIndex.filesBloomMightContain(spark, dir, "tbf", "zzyzxq")
    assert(survivors.size < 8, s"token probe did not prune: $survivors")
    val ids = SkipIndex.readPruned(spark, dir, survivors)
      .filter(array_contains(split(lower($"text"), "[^a-z0-9]+"), "zzyzxq"))
      .select("id").as[Long].collect()
    assert(ids.toSeq == Seq(137L))
    // a token in every file survives everywhere (no false pruning)
    assert(SkipIndex.filesBloomMightContain(spark, dir, "tbf", "common").size == 8)
    // EXPLAIN indexes=1 style report composes layers
    val (report, surviving2) = SkipIndex.pruningReport(spark, dir,
      Seq("tokenbf(tbf)" -> survivors))
    assert(report.matches("tokenbf\\(tbf\\): Parts \\d/8"), report)
    assert(surviving2.size == survivors.size)
  }

  test("set(N) index: capped distinct sets, NULL = always match") {
    val dir = Files.createTempDirectory("graft_skip").toString + "/t"
    table(dir)
    // cat has ~1-2 distinct per file (cap holds); key blows the cap -> NULL
    SkipIndex.buildSet(spark, dir, "cat", "set_cat", maxValues = 10)
    SkipIndex.buildSet(spark, dir, "key", "set_key", maxValues = 10)
    val catSurvivors = SkipIndex.filesSetMightContain(spark, dir, "set_cat", "cat0")
    assert(catSurvivors.size < 8, s"set index did not prune: $catSurvivors")
    // over-cap summaries are NULL and never prune
    assert(SkipIndex.filesSetMightContain(spark, dir, "set_key", "k0").size == 8)
    val pruned = SkipIndex.readPruned(spark, dir, catSurvivors)
      .filter($"cat" === "cat0").count()
    assert(pruned == 100)
  }

  test("ngrambf index prunes substring (LIKE) searches") {
    val dir = Files.createTempDirectory("graft_skip").toString + "/t"
    table(dir)
    SkipIndex.buildNgramBloom(spark, dir, "text", "nbf", n = 3,
      expectedPerFile = 100000)
    // 'zzyzxq' lives in one file; probe by a mid-substring LIKE would use
    val survivors = SkipIndex.filesNgramMightContain(spark, dir, "nbf", "zyzx")
    assert(survivors.size < 8, s"ngram probe did not prune: $survivors")
    val ids = SkipIndex.readPruned(spark, dir, survivors)
      .filter($"text".contains("zyzx")).select("id").as[Long].collect()
    assert(ids.toSeq == Seq(137L))
    // needle shorter than n: index unusable, all files survive
    assert(SkipIndex.filesNgramMightContain(spark, dir, "nbf", "zy").size == 8)
    // substring present everywhere survives everywhere
    assert(SkipIndex.filesNgramMightContain(spark, dir, "nbf", "common").size == 8)
  }

  test("files added AFTER the index build always survive pruning") {
    val dir = Files.createTempDirectory("graft_skip").toString + "/t"
    table(dir)
    SkipIndex.buildBloom(spark, dir, "key", "bf3", expectedPerFile = 1000)
    // a new file lands after the build (incremental ingest)
    Seq((9001L, "brandnewkey", "cat9", "late arrival text"))
      .toDF("id", "key", "cat", "text")
      .write.mode("append").parquet(dir)
    val survivors = SkipIndex.filesBloomMightContain(spark, dir, "bf3", "brandnewkey")
    val ids = SkipIndex.readPruned(spark, dir, survivors)
      .filter($"key" === "brandnewkey").select("id").as[Long].collect()
    assert(ids.toSeq == Seq(9001L),
      s"stale sidecar must never prune unindexed files (survivors=$survivors)")
  }

  test("no survivors yields an empty read with the table schema") {
    val dir = Files.createTempDirectory("graft_skip").toString + "/t"
    table(dir)
    SkipIndex.buildBloom(spark, dir, "key", "bf2", expectedPerFile = 1000)
    val survivors = SkipIndex.filesBloomMightContain(spark, dir, "bf2",
      "definitely-not-present-anywhere-xq")
    val out = SkipIndex.readPruned(spark, dir, survivors)
    assert(out.columns.toSeq == Seq("id", "key", "cat", "text"))
    // bloom may false-positive a file or two; the exact filter still wins
    assert(out.filter($"key" === "definitely-not-present-anywhere-xq").count() == 0)
  }
}
