package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Input/output FORMAT surface (SURVEY.md §2.1): CSVWithNames,
  * TSV(WithNames), JSONEachRow, Parquet, Values, Null — plus generator
  * sources (numbers, generateRandom) and the File-engine append pattern.
  * Everything is a thin, option-correct wrapper over Spark's readers so
  * schema inference, pushdown and parallel reads are native.
  */
object Formats {

  // ---- readers (homeworks/hw03.md:114-117 CSVWithNames load;
  // lectures/lecture_03.md:335-364 schema inference)

  def csvWithNames(spark: SparkSession, path: String,
                   schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  def tsvWithNames(spark: SparkSession, path: String,
                   schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true").option("sep", "\t")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** TabSeparated without header: schema mandatory (as in the reference's
    * `file('path', 'TSV', 'a UInt64, b String')`).
    */
  def tsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("sep", "\t").schema(schema).csv(path)

  def jsonEachRow(spark: SparkSession, path: String,
                  schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read)(spark.read.schema).json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Brace-glob expansion for the reference's `trips_{0..2}.gz` URL form
    * (homeworks/hw02.md:75-78): expands to explicit paths for any reader.
    */
  def braceGlob(pattern: String): Seq[String] = {
    val re = "\\{(\\d+)\\.\\.(\\d+)\\}".r
    re.findFirstMatchIn(pattern) match {
      case Some(m) =>
        (m.group(1).toInt to m.group(2).toInt).flatMap(i =>
          braceGlob(pattern.substring(0, m.start) + i + pattern.substring(m.end)))
      case None => Seq(pattern)
    }
  }

  /** Fetch a URL's full body with connect/read timeouts (a hung remote
    * must fail the task, not wedge the executor forever).
    */
  private def fetchUrl(u: String, connectTimeoutMs: Int,
                       readTimeoutMs: Int): String = {
    val conn = new java.net.URL(u).openConnection()
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    val in = conn.getInputStream
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Quote-aware CSV record split: records end at newlines OUTSIDE
    * double-quoted fields (so quoted fields may embed separators and
    * newlines; `""` escapes a quote). Returns logical records, newline
    * normalized away at record ends only.
    */
  private[sources] def splitCsvRecords(body: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '"') { inQ = !inQ; cur.append(c) }
      else if ((c == '\n' || c == '\r') && !inQ) {
        if (c == '\r' && i + 1 < body.length && body.charAt(i + 1) == '\n') i += 1
        if (cur.nonEmpty) { out += cur.result(); cur.clear() }
      } else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  /** Quote-aware field split of one logical record: separators inside
    * quotes are literal; surrounding quotes strip; `""` unescapes.
    */
  private[sources] def parseCsvRecord(rec: String, sep: Char): Array[String] = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < rec.length) {
      val c = rec.charAt(i)
      if (c == '"') {
        if (inQ && i + 1 < rec.length && rec.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else inQ = !inQ
      } else if (c == sep && !inQ) { fields += cur.result(); cur.clear() }
      else cur.append(c)
      i += 1
    }
    fields += cur.result()
    fields.toArray
  }

  /** url('http://host/file{1..3}.csv', CSVWithNames) / ENGINE=URL
    * (homeworks/hw02.md:75-78, lectures/lecture_09.md:285-320): brace glob
    * expands driver-side; each expanded URL is then fetched by its own
    * EXECUTOR task (one partition per URL), so an N-file glob downloads in
    * parallel — the distributed analogue of the reference's url() table
    * function. The header comes from one driver-side read of the first
    * URL; every task drops its own file's header record.
    *
    * Parsing is RECORD-level, not line-level: quoted fields may embed
    * separators and newlines (the usual CSV corner a physical-line split
    * mis-parses). Fetches carry connect/read timeouts. Short records pad
    * with nulls, long ones truncate (PERMISSIVE-style); empty fields read
    * as null. Columns cast to the given schema with `try_cast` semantics
    * (malformed values → null, as a CSV reader's permissive mode), or
    * stay all-string when none — matching `url(...)` without an explicit
    * structure.
    */
  def urlCsvWithNames(spark: SparkSession, urlPattern: String,
                      sep: String = ",",
                      schema: Option[StructType] = None,
                      connectTimeoutMs: Int = 10000,
                      readTimeoutMs: Int = 120000): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    require(sep.length == 1, s"single-char separator required, got '$sep'")
    val sepC = sep.charAt(0)
    val urls = braceGlob(urlPattern)
    val header = splitCsvRecords(
      fetchUrl(urls.head, connectTimeoutMs, readTimeoutMs)).head
    val cols = parseCsvRecord(header, sepC)
    val n = cols.length
    val strSchema = StructType(cols.map(c =>
      org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    val (cT, rT) = (connectTimeoutMs, readTimeoutMs)
    val rows = spark.createDataset(urls).repartition(urls.size)
      .flatMap { u =>
        splitCsvRecords(fetchUrl(u, cT, rT)).drop(1).map { rec =>
          val fs = parseCsvRecord(rec, sepC)
          val aligned = Array.tabulate[Any](n)(i =>
            if (i < fs.length && fs(i).nonEmpty) fs(i) else null)
          org.apache.spark.sql.Row.fromSeq(aligned.toSeq)
        }
      }(org.apache.spark.sql.Encoders.row(strSchema))
    schema match {
      case None => rows.toDF()
      case Some(s) => rows.toDF().select(s.fields.map(f =>
        expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").as(f.name)).toSeq: _*)
    }
  }

  def urlTsvWithNames(spark: SparkSession, urlPattern: String,
                      schema: Option[StructType] = None): DataFrame =
    urlCsvWithNames(spark, urlPattern, "\t", schema)

  /** Generic JDBC table read — the engine shared by [[postgresql]] and any
    * other ENGINE=<RDBMS> integration. `partitionColumn` bounds
    * parallelize the read at scale.
    */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(spark.read.format("jdbc")
        .option("url", url).option("dbtable", table)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** JDBC write (INSERT INTO ENGINE=PostgreSQL flow, homeworks/hw19.md). */
  def jdbcWrite(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Append,
                props: Map[String, String] = Map.empty): Unit =
    props.foldLeft(df.write.format("jdbc")
        .option("url", url).option("dbtable", table)) {
      case (w, (k, v)) => w.option(k, v)
    }.mode(mode).save()

  /** postgresql('host:port','db','table','user','pw') table function /
    * ENGINE=PostgreSQL (homeworks/hw19.md:37-118): external RDBMS table
    * through Spark's JDBC source. The JDBC path itself is spec-exercised
    * against embedded Derby (no postgres endpoint in this harness).
    */
  def postgresql(spark: SparkSession, hostPort: String, db: String,
                 table: String, user: String, password: String,
                 schema: String = "public"): DataFrame =
    jdbc(spark, s"jdbc:postgresql://$hostPort/$db", s"$schema.$table",
      Map("user" -> user, "password" -> password))

  // ---- INSERT ... VALUES (lectures/lecture_03.md:196-203)

  def values(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), schema)

  // ---- generator sources

  /** numbers(N) / system.numbers (lectures/lecture_07.md:43-49). */
  def numbers(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).withColumnRenamed("id", "number")

  /** generateRandom (lectures/lecture_08.md:234): seeded, reproducible. */
  def generateRandom(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    spark.range(n)
      .withColumn("rand_double", rand(seed))
      .withColumn("rand_normal", randn(seed + 1))
      .withColumn("rand_uint", (rand(seed + 2) * Long.MaxValue).cast("long"))

  // ---- sinks

  /** FORMAT Null / ENGINE=Null (lectures/lecture_21.md:46-56): execute the
    * plan, discard rows (benchmarking / MV-only pipes).
    */
  def nullSink(df: DataFrame): Unit =
    df.write.format("noop").mode(SaveMode.Overwrite).save()

  /** ENGINE=File append semantics (lectures/lecture_09.md:374-422). */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).option("header", "true").csv(path)

  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** *Log-engine analogue (lectures/lecture_09.md:5-71): unsorted append-
    * only table — plain parquet append without sort keys.
    */
  def logEngineAppend(df: DataFrame, path: String): Unit = appendParquet(df, path)
}
