package graft.mergetree

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Read-time `FINAL` semantics of the MergeTree engine family
  * (SURVEY.md §2.10; lectures/lecture_07.md:417-790, homeworks/hw05.md).
  *
  * In the reference, folding happens lazily at background merges, so a
  * plain read sees unfolded duplicates and `SELECT ... FINAL` folds at read
  * time. Our base tables are append-only parquet; these functions are the
  * FINAL views. [[Compaction]] materializes the same fold back to storage
  * (the analogue of OPTIMIZE TABLE ... FINAL).
  *
  * All folds are single-shuffle on the sort key: a window or hash
  * aggregation, both of which Spark executes with partial aggregation /
  * spill, so they hold at 100 TB provided the key has reasonable
  * cardinality (same constraint the reference has).
  */
object FoldViews {

  /** ReplacingMergeTree([version]) FINAL (lectures/lecture_07.md:551-677):
    * keep only the highest-version row per key. Same answer as the
    * reference's own manual-dedup idiom `row_number() over (partition by
    * id order by ... desc) = 1` (lectures/lecture_07.md:581-609), but
    * executed as a `max_by` HASH aggregate rather than a window: the
    * window plan sort-shuffles every duplicate row, while the aggregate
    * gets map-side partial combine — in a replacing workload duplicates
    * are the norm, so at 100 TB the combine collapses them before the
    * exchange and no per-partition sort is paid at all (r13).
    *
    * `version` must be a total order within a key for determinism (the
    * reference has the same caveat: ties resolved by part order; callers
    * pass struct(version, part_seq) which is unique).
    */
  def replacingFinal(df: DataFrame, keys: Seq[String], version: Column): DataFrame = {
    val payload = struct(df.columns.map(col).toSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, version).as("__win"))
      .select(df.columns.map(c => col("__win").getField(c).as(c)).toSeq: _*)
  }

  /** SummingMergeTree(cols) FINAL (lectures/lecture_07.md:430-493): group
    * rows by the sort key, sum the listed columns; other columns get an
    * arbitrary surviving value — we pick `min` for determinism (the
    * reference warns reads must not depend on which survives).
    */
  def summingFinal(df: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(c => keys.contains(c) || sumCols.contains(c))
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++ others.map(c => min(col(c)).as(c))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(df.columns.map(col).toSeq: _*) // restore original column order
  }

  /** CollapsingMergeTree(sign) FINAL (lectures/lecture_07.md:680-736):
    * +1/-1 rows with the same key cancel pairwise; the demo's FINAL
    * contract: positive net → the LAST state (+1) row survives; negative
    * net → the FIRST cancel (-1) row survives ("строки без пары
    * сохраняются"); zero net → the key vanishes.
    */
  def collapsingFinal(df: DataFrame, keys: Seq[String], sign: String,
                      version: Column): DataFrame = {
    val kw = Window.partitionBy(keys.map(col): _*)
    val withNet = df.withColumn("__net", sum(col(sign)).over(kw))
    val plusW = Window.partitionBy(keys.map(col): _*).orderBy(version.desc)
    val minusW = Window.partitionBy(keys.map(col): _*).orderBy(version.asc)
    val lastPlus = withNet
      .filter(col(sign) === 1 && col("__net") > 0)
      .withColumn("__rn", row_number().over(plusW))
    val firstMinus = withNet
      .filter(col(sign) === -1 && col("__net") < 0)
      .withColumn("__rn", row_number().over(minusW))
    lastPlus.unionByName(firstMinus)
      .filter(col("__rn") === 1)
      .drop("__rn", "__net")
  }

  /** VersionedCollapsingMergeTree(sign, version)
    * (lectures/lecture_07.md:738-790): cancellation pairs rows with the
    * same key AND version and opposite sign — each cancel consumes the
    * LATEST not-yet-cancelled state (the reference demo cancels state_3 of
    * {state_1,state_2,state_3} at the same version). FINAL = ALL surviving
    * rows, across versions. `seq` is the insertion order within a
    * (key, version) group.
    */
  def versionedCollapsingFinal(df: DataFrame, keys: Seq[String], sign: String,
                               version: String, seq: Column): DataFrame = {
    val kv = (keys :+ version).map(col)
    val plusW = Window.partitionBy(kv: _*).orderBy(seq.desc)
    val minusW = Window.partitionBy(kv: _*).orderBy(seq.desc)
    val minusCnt = df.filter(col(sign) === -1)
      .groupBy(kv: _*).agg(count(lit(1)).as("__m"))
    val plusCnt = df.filter(col(sign) === 1)
      .groupBy(kv: _*).agg(count(lit(1)).as("__p"))
    val survivingPlus = df.filter(col(sign) === 1)
      .withColumn("__rn", row_number().over(plusW))
      .join(minusCnt, keys :+ version, "left")
      .filter(col("__rn") > coalesce(col("__m"), lit(0L)))
      .drop("__rn", "__m")
    val survivingMinus = df.filter(col(sign) === -1)
      .withColumn("__rn", row_number().over(minusW))
      .join(plusCnt, keys :+ version, "left")
      .filter(col("__rn") > coalesce(col("__p"), lit(0L)))
      .drop("__rn", "__p")
    survivingPlus.unionByName(survivingMinus)
  }
}
