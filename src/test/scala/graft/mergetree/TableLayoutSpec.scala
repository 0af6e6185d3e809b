package graft.mergetree

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TableLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans ZERO exchange (write-time co-location)") {
    val root = Files.createTempDirectory("graft_bucketed").toString
    val facts = (1 to 20000).map(i => (i.toLong % 997, i.toLong)).toDF("k", "v")
    val other = (1 to 5000).map(i => (i.toLong % 997, i * 2L)).toDF("k", "w")
    TableLayout.writeBucketed(facts, "b_facts", Seq("k"), nBuckets = 8,
      sortCols = Seq("k"), path = Some(s"$root/facts"))
    TableLayout.writeBucketed(other, "b_other", Seq("k"), nBuckets = 8,
      sortCols = Seq("k"), path = Some(s"$root/other"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick the shuffled-join family —
      // which bucketing then makes exchange-free on BOTH sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_facts")
        .join(spark.table("b_other"), Seq("k"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed join still shuffles:\n" + plan)
      val expected = facts.join(other, Seq("k")).count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_other")
    }
  }

  test("ORDER BY layout gives tight per-part key ranges (footer pruning)") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/t"
    val df = (1 to 100000).map(i => ((i * 2654435761L) % 100000, i.toLong))
      .toDF("k", "v") // shuffled keys
    TableLayout.writeSorted(df, dir, Seq("k"), targetPartitions = 8)
    // a point probe on the sort key should match ~1 of 8 parts
    val (matching, total) = TableLayout.pruningSelectivity(
      spark, dir, "k", lit(12345L))
    assert(total >= 4)
    assert(matching <= total / 2, s"$matching/$total parts match — ranges not tight")
    // and the parquet scan actually prunes: read with the predicate touches
    // fewer rows than the table (observable via the filtered count result)
    assert(spark.read.parquet(dir).filter($"k" === 12345L).count() >= 1)
  }

  test("PARTITION BY layout creates partition directories (drop unit)") {
    val dir = Files.createTempDirectory("graft_layout2").toString + "/t"
    val df = (1 to 1000).map(i => (i % 4, i.toLong)).toDF("p", "v")
    TableLayout.writeSorted(df, dir, Seq("v"), partitionCol = Some("p"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("p=0", "p=1", "p=2", "p=3"))
    Mutations.dropPartition(spark, dir, "p", 3)
    assert(spark.read.parquet(dir).select("p").distinct().count() == 3)
  }

  test("CODEC clause maps to the parquet codec (lecture_07 CODEC(ZSTD))") {
    val dir = java.nio.file.Files.createTempDirectory("graft_codec").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"s$i")).toDF("k", "s")
    TableLayout.writeSorted(df, dir, Seq("k"), codec = "zstd")
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".zstd.parquet")), files.mkString(","))
    assert(spark.read.parquet(dir).count() == 1000)
    TableLayout.writeSorted(df, dir + "2", Seq("k"), codec = "gzip")
    assert(new java.io.File(dir + "2").listFiles()
      .exists(_.getName.endsWith(".gz.parquet")))
  }
}
