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
}
