package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Reads are plain parquet scans: column pruning and predicate pushdown are
  * delegated to Catalyst / the parquet reader, which is exactly the behavior
  * the reference gets from its sparse primary index + columnar parts
  * (reference: lectures/lecture_04.md:40-42).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively; read it as nanos-since-epoch long and floor to microsecond
    * TimestampType. Integer `div` (not `/`) — the nano count exceeds 2^53,
    * a double division would lose precision.
    */
  private def withNanoTs(name: String, tsCol: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(name)
    if (raw.schema(tsCol).dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn(tsCol,
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(s"$tsCol div 1000")))
    else raw
  }

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def events: DataFrame = withNanoTs("events", "ts")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
