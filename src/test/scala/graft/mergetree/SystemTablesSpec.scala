package graft.mergetree

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SystemTablesSpec extends SparkSpec {
  import spark.implicits._

  test("parts / partsColumns / columns read footer truth per file") {
    val dir = Files.createTempDirectory("graft_sys").toString + "/t"
    (0 until 1000).map(i => (i.toLong, s"v$i", i % 7))
      .toDF("id", "s", "k")
      .repartition(3).write.parquet(dir)

    val parts = SystemTables.parts(spark, dir)
    assert(parts.count() == 3)
    assert(parts.agg(sum($"rows")).as[Long].head == 1000L)
    assert(parts.filter(!$"active").isEmpty)
    // bytes_on_disk is the real file length
    val byName = parts.select($"part", $"bytes_on_disk").as[(String, Long)]
      .collect().toMap
    val fsLens = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap
    assert(byName == fsLens)

    val cols = SystemTables.columns(spark, dir)
    val m = cols.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set("id", "s", "k"))
    assert(m.values.forall(_ == 1000L))
    // compressed/uncompressed are positive and uncompressed >= values
    assert(cols.filter($"compressed_bytes" <= 0 || $"uncompressed_bytes" <= 0).isEmpty)

    val pc = SystemTables.partsColumns(spark, dir)
    assert(pc.count() == 9) // 3 files x 3 columns
    assert(pc.select("codec").distinct().count() == 1)
  }

  test("detached parts report active=false; partition dirs surface") {
    val dir = Files.createTempDirectory("graft_sys2").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.partitionBy("s").parquet(dir)
    // simulate DETACH by moving one partition dir under _detached/
    val root = new java.io.File(dir)
    val det = new java.io.File(root, "_detached/s=b")
    det.getParentFile.mkdirs()
    assert(new java.io.File(root, "s=b").renameTo(det))

    val parts = SystemTables.parts(spark, dir)
    val act = parts.filter($"active").select("partition").as[String].collect()
    val ina = parts.filter(!$"active").select("partition").as[String].collect()
    assert(act.toSeq == Seq("s=a"))
    assert(ina.toSeq == Seq("_detached/s=b"))
  }

  test("tables lists catalog views") {
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("systables_probe")
    val t = SystemTables.tables(spark)
    val row = t.filter($"name" === "systables_probe").collect()
    assert(row.length == 1 && row.head.getAs[Boolean]("is_temporary"))
  }
}
