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

  /** postgresql('host:port','db','table','user','pw') table function /
    * ENGINE=PostgreSQL (homeworks/hw19.md:37-118): external RDBMS table
    * through Spark's JDBC source. `partitionColumn` options parallelize
    * the read at scale. Untestable in this harness (no DB endpoint); the
    * wrapper is the documented surface.
    */
  def postgresql(spark: SparkSession, hostPort: String, db: String,
                 table: String, user: String, password: String,
                 schema: String = "public"): DataFrame =
    spark.read.format("jdbc")
      .option("url", s"jdbc:postgresql://$hostPort/$db")
      .option("dbtable", s"$schema.$table")
      .option("user", user)
      .option("password", password)
      .load()

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
