package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{Row, SaveMode}
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

  test("url() + brace glob reads CSV over real HTTP (loopback server)") {
    // homeworks/hw02.md:75-78 — url('...trips_{0..2}.gz', CSVWithNames)
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val files = Map(
      "/trips_0.csv" -> "id,city\n1,berlin\n2,paris\n",
      "/trips_1.csv" -> "id,city\n3,madrid\n",
      "/trips_2.csv" -> "id,city\n4,rome\n5,oslo\n")
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    files.foreach { case (p, body) =>
      server.createContext(p, new HttpHandler {
        override def handle(x: HttpExchange): Unit = {
          val b = body.getBytes("UTF-8")
          x.sendResponseHeaders(200, b.length)
          x.getResponseBody.write(b)
          x.close()
        }
      })
    }
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = Formats.urlCsvWithNames(spark,
        s"http://127.0.0.1:$port/trips_{0..2}.csv")
      assert(df.columns.toSeq == Seq("id", "city"))
      val rows = df.select($"id".cast("long"), $"city")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(rows == Seq(1L -> "berlin", 2L -> "paris", 3L -> "madrid",
        4L -> "rome", 5L -> "oslo"))
      // one partition per URL: the three fetches are executor tasks
      assert(df.rdd.getNumPartitions >= 1)
    } finally server.stop(0)
  }

  test("url() parses quoted fields with embedded newlines and separators") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val body = "id,quote\n1,\"line one\nline two\"\n2,\"has, comma and \"\"quote\"\"\"\n3,plain\n"
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/q.csv", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val b = body.getBytes("UTF-8")
        x.sendResponseHeaders(200, b.length)
        x.getResponseBody.write(b)
        x.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = Formats.urlCsvWithNames(spark, s"http://127.0.0.1:$port/q.csv")
      val rows = df.as[(String, String)].collect().sortBy(_._1).toSeq
      assert(rows == Seq(
        "1" -> "line one\nline two",
        "2" -> "has, comma and \"quote\"",
        "3" -> "plain"))
    } finally server.stop(0)
  }

  test("csv record/field split: quotes, escapes, crlf, ragged rows") {
    assert(Formats.splitCsvRecords("a,b\r\nc,\"d\ne\"\nf\n") ==
      Vector("a,b", "c,\"d\ne\"", "f"))
    assert(Formats.parseCsvRecord("a,\"b,c\",\"d\"\"e\"", ',').toSeq ==
      Seq("a", "b,c", "d\"e"))
    assert(Formats.parseCsvRecord("x,,z", ',').toSeq == Seq("x", "", "z"))
  }

  test("JDBC round-trip against embedded Derby (postgresql() engine path)") {
    // homeworks/hw19.md:37-118 — write, append, read back over JDBC
    val url = "jdbc:derby:memory:graftdb;create=true"
    val base = Seq((1L, "alpha"), (2L, "beta")).toDF("k", "s")
    Formats.jdbcWrite(base, url, "t_rt", SaveMode.Overwrite)
    Formats.jdbcWrite(Seq((3L, "gamma")).toDF("k", "s"), url, "t_rt")
    val back = Formats.jdbc(spark, url, "t_rt")
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(back == Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    // table-function form: dbtable can be a subquery pushdown
    val filtered = Formats.jdbc(spark, url,
      """(SELECT "k" FROM t_rt WHERE "k" > 1) sub""")
      .as[Long].collect().sorted.toSeq
    assert(filtered == Seq(2L, 3L))
  }
}
