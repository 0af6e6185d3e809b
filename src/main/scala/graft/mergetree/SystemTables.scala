package graft.mergetree

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's introspection surface: `system.parts`,
  * `system.parts_columns` and the per-column compression summary the
  * course derives from them (`lectures/lecture_02.md:199-231` part tours,
  * `lecture_08.md:321` parts_columns, `lecture_12.md:246` codec
  * comparisons, `lecture_07.md:76,267,409` size-per-part queries).
  *
  * Everything reads parquet FOOTERS, not data — and reads them on the
  * executors: the file list is parallelized and each task opens only its
  * own files' metadata, so introspecting a 100 TB / million-file table
  * costs one footer round-trip per file spread across the cluster, never
  * a driver-side loop. The driver's Hadoop conf entries ride along so
  * non-local filesystems resolve identically on the executors.
  */
object SystemTables {

  /** One row per (data file, column chunk set): the system.parts
    * analogue. `partition` is the hive-style relative subdirectory
    * ("" for unpartitioned); `active` is false for parts sitting in a
    * `_detached/` subtree (DETACH PARTITION moves them there).
    */
  def parts(spark: SparkSession, path: String): DataFrame = {
    footerRows(spark, path).groupBy(col("part"), col("partition"), col("active"))
      .agg(first(col("file_rows")).as("rows"),
        first(col("file_bytes")).as("bytes_on_disk"),
        sum(col("compressed")).as("data_compressed_bytes"),
        sum(col("uncompressed")).as("data_uncompressed_bytes"),
        first(col("n_row_groups")).as("n_row_groups"))
  }

  /** One row per (data file, column): the system.parts_columns analogue —
    * per-chunk value counts, compressed/uncompressed bytes and codec.
    */
  def partsColumns(spark: SparkSession, path: String): DataFrame =
    footerRows(spark, path).select(
      col("part"), col("partition"), col("active"), col("column"),
      col("n_values"), col("compressed").as("compressed_bytes"),
      col("uncompressed").as("uncompressed_bytes"), col("codec"))

  /** Per-column storage summary across all active parts — the
    * compression-ratio query the course runs against system.columns
    * (`lectures/lecture_12.md`, codec homework): bytes on disk vs raw.
    */
  def columns(spark: SparkSession, path: String): DataFrame =
    partsColumns(spark, path).filter(col("active"))
      .groupBy(col("column"))
      .agg(sum(col("n_values")).as("n_values"),
        sum(col("compressed_bytes")).as("compressed_bytes"),
        sum(col("uncompressed_bytes")).as("uncompressed_bytes"),
        first(col("codec")).as("codec"))

  /** system.tables analogue over the session catalog: name, database,
    * type, temporary flag.
    */
  def tables(spark: SparkSession): DataFrame = {
    val rows = spark.catalog.listTables().collect().toSeq.map { t =>
      (t.name, Option(t.database).getOrElse(""), t.tableType, t.isTemporary)
    }
    spark.createDataFrame(rows)
      .toDF("name", "database", "engine", "is_temporary")
  }

  /** Recursive parquet data-file listing with the table's underscore
    * convention: `_`-prefixed subtrees (skip-index sidecars, markers) are
    * not data; `_detached/` parts are included only when `keepDetached`
    * (they surface as active=false). Shared by the introspection views
    * and [[SkipIndex]]'s pruning so the two can never disagree on what
    * counts as a data file.
    */
  private[mergetree] def listDataFiles(
      spark: SparkSession, path: String,
      keepDetached: Boolean): Seq[(String, Long)] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val qualRoot = fs.makeQualified(root).toString
    Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .filter { f =>
        val segs = f.getPath.toString.stripPrefix(qualRoot).split('/')
        segs.forall(s => !s.startsWith("_") || (keepDetached && s == "_detached"))
      }
      .map(f => (f.getPath.toString, f.getLen))
      .toVector
  }

  /** Flat per-(file, column-chunk) footer facts every view above derives
    * from. One row per (file, row group, column) pre-aggregated to
    * (file, column).
    */
  private def footerRows(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(hconf)
    val files = listDataFiles(spark, path, keepDetached = true)
    // conf entries ride to the executors as plain pairs (Configuration
    // itself is not serializable)
    val confPairs = hconf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val rootStr = fs.makeQualified(root).toString
    val n = math.max(1, math.min(files.size,
      spark.sessionState.conf.numShufflePartitions))
    spark.createDataset(files).repartition(n).mapPartitions { part =>
      val conf = new Configuration(false)
      confPairs.foreach { case (k, v) => conf.set(k, v) }
      part.flatMap { case (file, fileLen) =>
        val p = new Path(file)
        val rel = file.stripPrefix(rootStr).stripPrefix("/")
        val dir = rel.split('/').dropRight(1).mkString("/")
        val active = !rel.split('/').contains("_detached")
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val fileRows = blocks.map(_.getRowCount).sum
          blocks.flatMap(b => b.getColumns.asScala.map(c =>
            (p.getName, dir, active, c.getPath.toDotString,
              c.getValueCount, c.getTotalSize, c.getTotalUncompressedSize,
              c.getCodec.name, fileRows, fileLen, blocks.size)))
            .groupBy(t => t._4)
            .map { case (_, chunks) =>
              val h = chunks.head
              (h._1, h._2, h._3, h._4, chunks.map(_._5).sum,
                chunks.map(_._6).sum, chunks.map(_._7).sum, h._8, h._9,
                h._10, h._11)
            }.iterator
        } finally reader.close()
      }
    }.toDF("part", "partition", "active", "column", "n_values",
      "compressed", "uncompressed", "codec", "file_rows", "file_bytes",
      "n_row_groups")
  }
}
