package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("csvWithNames round-trips with header and inference") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("k", "s").write.option("header", "true").csv(dir)
    val back = Formats.csvWithNames(spark, dir)
    assert(back.columns.toSeq == Seq("k", "s"))
    assert(back.count() == 2)
    assert(back.schema("k").dataType == IntegerType) // inferred
  }

  test("tsvWithNames reads tab-separated") {
    val dir = Files.createTempDirectory("graft_tsv").toString + "/t"
    Seq((1, "x")).toDF("k", "s").write
      .option("header", "true").option("sep", "\t").csv(dir)
    assert(Formats.tsvWithNames(spark, dir).count() == 1)
  }

  test("jsonEachRow honors an explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString + "/t"
    Seq((1L, "a")).toDF("k", "s").write.json(dir)
    val schema = StructType(Seq(StructField("k", LongType), StructField("s", StringType)))
    val back = Formats.jsonEachRow(spark, dir, Some(schema))
    assert(back.schema == schema)
  }

  test("braceGlob expands the reference's {0..2} URL form") {
    assert(Formats.braceGlob("trips_{0..2}.gz") ==
      Seq("trips_0.gz", "trips_1.gz", "trips_2.gz"))
    assert(Formats.braceGlob("a_{1..2}_{3..4}") ==
      Seq("a_1_3", "a_1_4", "a_2_3", "a_2_4"))
  }

  test("values builds a DataFrame from literal rows") {
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("s", StringType)))
    val df = Formats.values(spark, schema, Seq(Row(1, "a"), Row(2, "b")))
    assert(df.count() == 2)
  }

  test("numbers and generateRandom are deterministic generators") {
    assert(Formats.numbers(spark, 100).count() == 100)
    val r1 = Formats.generateRandom(spark, 10).select("rand_double").as[Double].collect()
    val r2 = Formats.generateRandom(spark, 10).select("rand_double").as[Double].collect()
    assert(r1.sameElements(r2)) // seeded
  }

  test("nullSink executes the plan and discards rows") {
    Formats.nullSink(Formats.numbers(spark, 1000)) // must not throw
  }

  test("file-engine append accumulates rows") {
    val dir = Files.createTempDirectory("graft_append").toString + "/t"
    Formats.appendParquet(Seq(1, 2).toDF("x"), dir)
    Formats.appendParquet(Seq(3).toDF("x"), dir)
    assert(spark.read.parquet(dir).count() == 3)
  }
}
