package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Executable UDFs (SURVEY.md §2.9; lectures/lecture_06.md:88-99): an
  * external program fed rows on stdin, returning one output line per input
  * line — the reference configures these via XML; here they're RDD
  * `pipe()` per partition (one process per partition, amortized spawn, no
  * driver involvement — the shape that scales).
  */
object ExecutableUdf {

  /** Pipe a string dataset through a shell command line-by-line. */
  def pipeLines(ds: Dataset[String], command: String): Dataset[String] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.rdd.pipe(Seq("/bin/sh", "-c", command)).toDS()
  }

  /** Keyed pipe: feed `id<TAB>value` lines, parse `id<TAB>result` back,
    * and return (idCol, resultCol). Joining the result back to the source
    * frame keeps the contract row-aligned without trusting output order
    * across partitions.
    */
  def pipeKeyed(df: DataFrame, idCol: String, valueCol: String,
                command: String, resultCol: String = "result"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.select(
        concat_ws("\t", col(idCol).cast("string"), col(valueCol)).as("line"))
      .as[String]
    val piped = pipeLines(lines, command)
      .map { l =>
        val i = l.indexOf('\t')
        (l.substring(0, i).toLong, l.substring(i + 1))
      }
      .toDF(idCol, resultCol)
    piped
  }

  /** Executable dictionary source (lectures/lecture_17.md:23-54): run a
    * command once on the driver, parse TSV lines into a DataFrame for
    * registration as a dictionary.
    */
  def executableSource(spark: SparkSession, command: String,
                       colNames: Seq[String]): DataFrame = {
    import scala.sys.process._
    val rows = Seq("/bin/sh", "-c", command).!!.linesIterator
      .filter(_.nonEmpty)
      .map(l => org.apache.spark.sql.Row.fromSeq(l.split('\t').toSeq))
      .toSeq
    val schema = org.apache.spark.sql.types.StructType(colNames.map(n =>
      org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }
}
