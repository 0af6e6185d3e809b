package graft.mergetree

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The MergeTree storage layout contract (SURVEY.md §1.1): table = sorted
  * columnar parts under a partition key.
  *
  *  - `PARTITION BY expr` → Hive-style partition directories (the
  *    bulk-delete / pruning unit, lectures/lecture_04.md:90-102)
  *  - table-level `ORDER BY` → range-repartition + sortWithinPartitions at
  *    write, so parquet row-group min/max statistics are tight on the sort
  *    key — the sparse-primary-index effect (lectures/lecture_04.md:40-42):
  *    a point/range predicate on the sort key prunes most row groups via
  *    footer stats, without any index structure.
  *  - each INSERT appends new "parts" (files); [[Compaction]] is the
  *    background merge.
  */
object TableLayout {

  /** CREATE TABLE ... PARTITION BY p ORDER BY keys + INSERT.
    *
    * `codec` is the column-compression clause (`CODEC(ZSTD(n))`,
    * lectures/lecture_07.md:172, lecture_16.md:217-221) mapped to the
    * parquet file codec — zstd | snappy | gzip | lz4 | none. Delta/
    * dictionary encodings (the reference's `Delta`, `LowCardinality`) are
    * parquet-native per column and need no declaration; the sorted layout
    * this method produces is exactly what makes them effective.
    */
  def writeSorted(df: DataFrame, path: String, sortKeys: Seq[String],
                  partitionCol: Option[String] = None,
                  mode: SaveMode = SaveMode.Overwrite,
                  targetPartitions: Int = 0,
                  codec: String = "zstd"): Unit = {
    val keyCols = sortKeys.map(col)
    val n = if (targetPartitions > 0) targetPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val arranged = partitionCol match {
      case Some(p) =>
        // co-locate rows of one partition value, sorted by the key inside
        df.repartition(n, col(p)).sortWithinPartitions((col(p) +: keyCols): _*)
      case None =>
        df.repartitionByRange(n, keyCols: _*).sortWithinPartitions(keyCols: _*)
    }
    val w = arranged.write.mode(mode).option("compression", codec)
    partitionCol.fold(w)(p => w.partitionBy(p)).parquet(path)
  }

  /** Bucketed table write — the co-located-join layout for FACT-FACT
    * joins (two 100 TB tables joined on the same key must not shuffle
    * either side at query time; broadcast only covers small dims).
    * Spark's bucketing: rows are hash-clustered into `nBuckets` files per
    * write-task group and the catalog records the bucketing, so a join of
    * two tables bucketed on the same key with the same bucket count plans
    * ZERO Exchange — the shuffle happened once at write time, amortized
    * over every subsequent join. `sortCols` pre-sorts inside buckets
    * (removes the query-time Sort under SortMergeJoin too).
    *
    * This is the ClickHouse distributed-table sharding-key idiom
    * (`remote()/cluster()` tables sharded on a join key so GLOBAL JOIN is
    * local per shard) in Spark-native form.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite,
                    path: Option[String] = None): Unit = {
    val w0 = df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val w1 = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*)
             else w0
    val w = path.fold(w1)(p => w1.option("path", p))
    w.saveAsTable(table)
  }

  /** Per-file sort-key min/max — the analogue of system.parts'
    * primary-key ranges; shows what footer-stat pruning has to work with.
    */
  def partStats(spark: SparkSession, path: String, sortKey: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("part"))
      .agg(count(lit(1)).as("rows"),
        min(col(sortKey)).as(s"min_$sortKey"),
        max(col(sortKey)).as(s"max_$sortKey"))

  /** How selective can footer pruning be for an equality probe on the sort
    * key? Returns (matching parts, total parts) — on a well-sorted table
    * this approaches 1/total (the reference's "Parts: 1/10, Granules: 1/10"
    * EXPLAIN output, lectures/lecture_07.md:198-230).
    */
  def pruningSelectivity(spark: SparkSession, path: String, sortKey: String,
                         probe: Column): (Long, Long) = {
    val stats = partStats(spark, path, sortKey).cache()
    try {
      val total = stats.count()
      val matching = stats.filter(
        probe >= col(s"min_$sortKey") && probe <= col(s"max_$sortKey")).count()
      (matching, total)
    } finally { stats.unpersist(); () }
  }
}
