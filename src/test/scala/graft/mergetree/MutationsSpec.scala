package graft.mergetree

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(partitioned: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft_mut").toString + "/t"
    val df = (1 to 100).map(i => (i.toLong, i % 5, i * 1.0)).toDF("id", "p", "v")
    val w = df.write.mode("overwrite")
    (if (partitioned) w.partitionBy("p") else w).parquet(dir)
    dir
  }

  test("UPDATE rewrites matching rows only") {
    val t = tmpTable()
    Mutations.update(spark, t, col("id") <= 10, Map("v" -> lit(-1.0)))
    val out = spark.read.parquet(t)
    assert(out.filter($"v" === -1.0).count() == 10)
    assert(out.count() == 100)
  }

  test("DELETE removes matching rows") {
    val t = tmpTable()
    Mutations.delete(spark, t, col("id") > 90)
    assert(spark.read.parquet(t).count() == 90)
  }

  test("lightweight DELETE tombstones; readVisible hides; compaction purges") {
    val t = tmpTable()
    Mutations.lightweightDelete(spark, t, col("id") <= 20)
    assert(spark.read.parquet(t).count() == 100)            // rows still there
    assert(Mutations.readVisible(spark, t).count() == 80)   // but hidden
    Compaction.optimizeFinal(spark, t,
      df => df.filter(col(Mutations.RowExists) =!= 0).drop(Mutations.RowExists))
    assert(spark.read.parquet(t).count() == 80)
  }

  test("DROP PARTITION deletes one directory; MOVE PARTITION relocates it") {
    val t = tmpTable(partitioned = true)
    Mutations.dropPartition(spark, t, "p", 0)
    val left = spark.read.parquet(t)
    assert(left.select("p").distinct().as[Int].collect().toSet == Set(1, 2, 3, 4))
    val t2 = tmpTable(partitioned = true)
    Mutations.delete(spark, t2, col("p") === 1, partitionBy = Seq("p"))
    Mutations.movePartition(spark, t, t2, "p", 1)
    assert(spark.read.parquet(t2).filter($"p" === 1).count() == 20)
  }

  test("TTL retention drops expired rows") {
    val dir = Files.createTempDirectory("graft_ttl").toString + "/t"
    val now = java.sql.Timestamp.valueOf("2024-06-30 00:00:00")
    val df = (1 to 60).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-06-${i % 30 + 1}%02d 12:00:00"))
    }.toDF("id", "ts")
    df.write.mode("overwrite").parquet(dir)
    Mutations.applyTtl(spark, dir, "ts", retainDays = 7, now = now)
    val kept = spark.read.parquet(dir)
    assert(kept.count() == kept.filter($"ts" >= lit("2024-06-23 00:00:00")).count())
    assert(kept.count() > 0 && kept.count() < 60)
  }

  test("BACKUP / RESTORE round-trips a table through a snapshot") {
    val t = tmpTable()
    val bak = Files.createTempDirectory("graft_bak").toString + "/snap"
    Backup.backupTable(spark, t, bak)
    Mutations.delete(spark, t, col("id") > 0)          // wreck the table
    assert(spark.read.parquet(t).count() == 0)
    Backup.restoreTable(spark, bak, t)
    assert(spark.read.parquet(t).count() == 100)
  }

  test("OPTIMIZE DEDUPLICATE drops exact duplicates") {
    val dir = Files.createTempDirectory("graft_dedup").toString + "/t"
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "s")
    df.write.mode("overwrite").parquet(dir)
    Compaction.deduplicate(spark, dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("DETACH PARTITION hides data; ATTACH brings it back (hw11.md:132-163)") {
    val t = tmpTable(partitioned = true)
    assert(spark.read.parquet(t).count() == 100)
    Mutations.detachPartition(spark, t, "p", 0)
    assert(spark.read.parquet(t).count() == 80)            // p=0 invisible
    assert(new java.io.File(s"$t/_detached/p=0").exists())  // but not deleted
    Mutations.attachPartition(spark, t, "p", 0)
    assert(spark.read.parquet(t).count() == 100)
  }

  test("TRUNCATE / RENAME / EXCHANGE TABLES") {
    val a = tmpTable()
    val b = Files.createTempDirectory("graft_mut").toString + "/t2"
    Seq((999L, 9, 9.0)).toDF("id", "p", "v").write.parquet(b)

    Mutations.exchangeTables(spark, a, b)
    assert(spark.read.parquet(a).count() == 1)    // swapped
    assert(spark.read.parquet(b).count() == 100)

    val c = a.stripSuffix("/") + "_renamed"
    Mutations.renameTable(spark, a, c)
    assert(spark.read.parquet(c).count() == 1)
    assert(!new java.io.File(a).exists())

    Mutations.truncate(spark, c)
    assert(new java.io.File(c).isDirectory)
    assert(new java.io.File(c).listFiles().isEmpty)
  }

  test("ADD/DROP COLUMN are metadata-only; MATERIALIZE folds them in") {
    val t = tmpTable()
    val filesBefore = new java.io.File(t).listFiles().map(_.getName).toSet

    SchemaEvolution.addColumn(spark, t, "source", "'legacy'")
    SchemaEvolution.dropColumn(spark, t, "v")
    // no data file rewritten
    val filesAfter = new java.io.File(t).listFiles().map(_.getName).toSet
    assert((filesAfter -- filesBefore).forall(_.contains("_graft_schema.json")))

    val read = SchemaEvolution.readTable(spark, t)
    assert(read.columns.toSet == Set("id", "p", "source"))
    assert(read.filter($"source" === "legacy").count() == 100)

    // files written AFTER the ALTER carry the column; old files default
    Seq((101L, 0, "fresh")).toDF("id", "p", "source")
      .write.mode("append").parquet(t)
    val merged = SchemaEvolution.readTable(spark, t)
    assert(merged.filter($"source" === "fresh").count() == 1)
    assert(merged.filter($"source" === "legacy").count() == 100)

    SchemaEvolution.materialize(spark, t)
    val raw = spark.read.parquet(t)                       // no sidecar logic
    assert(raw.columns.toSet == Set("id", "p", "source"))
    assert(raw.filter($"source" === "legacy").count() == 100)
  }

  test("post-ALTER files keep explicitly stored NULLs in added columns") {
    val t = tmpTable()
    SchemaEvolution.addColumn(spark, t, "tag", "'dflt'")
    // a file written AFTER the ALTER stores an explicit NULL — it must
    // surface as NULL, not be rewritten to the default
    Seq((201L, 0, Some("real")), (202L, 0, None))
      .toDF("id", "p", "tag")
      .write.mode("append").parquet(t)
    val read = SchemaEvolution.readTable(spark, t)
    assert(read.filter($"id" === 201L).select("tag").head().getString(0) == "real")
    assert(read.filter($"id" === 202L).select("tag").head().isNullAt(0))
    // pre-ALTER files still default
    assert(read.filter($"tag" === "dflt").count() == 100)
  }

  test("MODIFY ORDER BY resorts so footer-stat ranges are disjoint") {
    val dir = Files.createTempDirectory("graft_sort").toString + "/t"
    // written in key-scrambled order → file min/max ranges all overlap
    (1 to 10000).map(i => ((i * 7919) % 10000L, s"r$i")).toDF("k", "s")
      .repartition(4).write.parquet(dir)
    SchemaEvolution.modifyOrderBy(spark, dir, Seq("k"))
    val out = spark.read.parquet(dir)
    assert(out.count() == 10000)
    val stats = TableLayout.partStats(spark, dir, "k")
      .orderBy($"min_k").select($"min_k", $"max_k")
      .as[(Long, Long)].collect()
    assert(stats.length > 1)
    stats.sliding(2).foreach { case Array((_, max1), (min2, _)) =>
      assert(max1 <= min2, s"file ranges overlap: $max1 > $min2")
    }
  }
}
