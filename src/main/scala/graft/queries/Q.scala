package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names/aliases MUST match between the two (the driver
  * hash-compares after sorting columns by name).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle.stripMargin.trim))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Driver compat: the driver's comparator round-trips results through
    * pandas and sorts rows with `DataFrame.sort_values`, which raises on
    * array-typed cells. Declared query outputs therefore serialize every
    * top-level array column to a comma-joined string (the array semantics
    * stay inside the operators; only the BOARD's declared output is
    * scalar). Oracles mirror with array_to_string / string_agg.
    */
  def scalarize(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat_ws}
    import org.apache.spark.sql.types.ArrayType
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType =>
          concat_ws(",", col(f.name).cast("array<string>")).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
