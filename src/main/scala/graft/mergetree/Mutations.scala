package graft.mergetree

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Mutations, deletes, TTL and partition manipulation (SURVEY.md §2.11) as
  * copy-on-write parquet rewrites — the same contract as the reference's
  * ALTER TABLE ... UPDATE/DELETE, which rewrite whole parts asynchronously
  * (lectures/lecture_16.md:173-199).
  *
  * Tables here are directories of parquet, optionally Hive-partitioned by
  * a partition column (`PARTITION BY` analogue). Partition-scoped
  * mutations rewrite only the affected partition directories — at 100 TB
  * the `IN PARTITION` form is the only sane one, exactly as in the
  * reference.
  */
object Mutations {

  /** Tombstone column used by lightweight DELETE
    * (lectures/lecture_16.md:196-202 `_row_exists`).
    */
  val RowExists = "_row_exists"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomically replace the table dir with `df` (write aside + rename). */
  private def rewrite(spark: SparkSession, tablePath: String, df: DataFrame,
                      partitionBy: Seq[String]): Unit = {
    val tmp = tablePath.stripSuffix("/") + ".__mutating__"
    val f = fs(spark, tablePath)
    f.delete(new Path(tmp), true)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    f.delete(new Path(tablePath), true)
    f.rename(new Path(tmp), new Path(tablePath))
  }

  /** ALTER TABLE ... UPDATE col=expr WHERE cond
    * (homeworks/hw11.md:95-130). Full-table copy-on-write.
    */
  def update(spark: SparkSession, tablePath: String, cond: Column,
             set: Map[String, Column], partitionBy: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(tablePath)
    val updated = set.foldLeft(df) { case (acc, (c, v)) =>
      acc.withColumn(c, when(cond, v).otherwise(col(c)))
    }
    rewrite(spark, tablePath, updated, partitionBy)
  }

  /** ALTER TABLE ... DELETE WHERE cond (lectures/lecture_12.md:218-231). */
  def delete(spark: SparkSession, tablePath: String, cond: Column,
             partitionBy: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(tablePath)
    rewrite(spark, tablePath, df.filter(!cond), partitionBy)
  }

  /** Lightweight DELETE FROM t WHERE cond (lectures/lecture_16.md:196-202):
    * mark `_row_exists=0`; physical removal deferred to [[Compaction]].
    */
  def lightweightDelete(spark: SparkSession, tablePath: String, cond: Column,
                        partitionBy: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(tablePath)
    val withFlag =
      if (df.columns.contains(RowExists)) df
      else df.withColumn(RowExists, lit(1))
    rewrite(spark, tablePath, withFlag.withColumn(RowExists,
      when(cond, lit(0)).otherwise(col(RowExists))), partitionBy)
  }

  /** Read view that hides tombstoned rows. */
  def readVisible(spark: SparkSession, tablePath: String): DataFrame = {
    val df = spark.read.parquet(tablePath)
    if (df.columns.contains(RowExists)) df.filter(col(RowExists) =!= 0).drop(RowExists)
    else df
  }

  /** Partition-scoped UPDATE (ALTER ... UPDATE ... IN PARTITION p): only
    * the matching partition directory is rewritten; the rest of the table
    * is untouched (dynamic partition overwrite).
    */
  def updateInPartition(spark: SparkSession, tablePath: String, partCol: String,
                        partValue: Any, cond: Column, set: Map[String, Column]): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val part = spark.read.parquet(tablePath).filter(col(partCol) === lit(partValue))
    val updated = set.foldLeft(part) { case (acc, (c, v)) =>
      acc.withColumn(c, when(cond, v).otherwise(col(c)))
    }
    updated.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(tablePath)
  }

  /** ALTER TABLE DROP PARTITION (homeworks/hw03.md:228-283): delete the
    * partition directory — an O(1) metadata operation, the bulk-delete
    * unit (lectures/lecture_04.md:90-102).
    */
  def dropPartition(spark: SparkSession, tablePath: String, partCol: String,
                    partValue: Any): Unit = {
    val dir = new Path(s"${tablePath.stripSuffix("/")}/$partCol=$partValue")
    fs(spark, tablePath).delete(dir, true)
  }

  /** MOVE/ATTACH PARTITION FROM another same-structure table
    * (lectures/lecture_16.md:143-152): directory-level move.
    */
  def movePartition(spark: SparkSession, fromTable: String, toTable: String,
                    partCol: String, partValue: Any): Unit = {
    val f = fs(spark, fromTable)
    val src = new Path(s"${fromTable.stripSuffix("/")}/$partCol=$partValue")
    val dst = new Path(s"${toTable.stripSuffix("/")}/$partCol=$partValue")
    f.mkdirs(dst.getParent)
    f.delete(dst, true)
    f.rename(src, dst)
  }

  /** ALTER TABLE DETACH PARTITION (homeworks/hw11.md:132-163): the
    * partition directory moves to the table's `_detached/` area (underscore-prefixed so
    * partition discovery ignores it) — data is
    * invisible to reads (Spark's partition discovery skips non-`col=value`
    * directories) but not deleted.
    */
  def detachPartition(spark: SparkSession, tablePath: String, partCol: String,
                      partValue: Any): Unit = {
    val f = fs(spark, tablePath)
    val base = tablePath.stripSuffix("/")
    val src = new Path(s"$base/$partCol=$partValue")
    val dst = new Path(s"$base/_detached/$partCol=$partValue")
    require(f.exists(src), s"no partition $partCol=$partValue to detach")
    f.mkdirs(dst.getParent)
    f.delete(dst, true)
    f.rename(src, dst)
  }

  /** ALTER TABLE ATTACH PARTITION: the inverse of [[detachPartition]]. */
  def attachPartition(spark: SparkSession, tablePath: String, partCol: String,
                      partValue: Any): Unit = {
    val f = fs(spark, tablePath)
    val base = tablePath.stripSuffix("/")
    val src = new Path(s"$base/_detached/$partCol=$partValue")
    val dst = new Path(s"$base/$partCol=$partValue")
    require(f.exists(src), s"no detached partition $partCol=$partValue")
    f.delete(dst, true)
    f.rename(src, dst)
  }

  /** TRUNCATE TABLE (lectures/lecture_12.md:237-242): drop all data, keep
    * the (empty) table directory.
    */
  def truncate(spark: SparkSession, tablePath: String): Unit = {
    val f = fs(spark, tablePath)
    val p = new Path(tablePath)
    f.delete(p, true)
    f.mkdirs(p)
  }

  /** RENAME TABLE a TO b: directory rename, O(1). */
  def renameTable(spark: SparkSession, fromPath: String, toPath: String): Unit = {
    val f = fs(spark, fromPath)
    require(!f.exists(new Path(toPath)), s"target $toPath already exists")
    f.rename(new Path(fromPath), new Path(toPath))
  }

  /** EXCHANGE TABLES a AND b (lectures/lecture_12.md): atomic-ish swap via
    * a temporary name — both tables keep serving under the other's path.
    */
  def exchangeTables(spark: SparkSession, aPath: String, bPath: String): Unit = {
    val f = fs(spark, aPath)
    val tmp = new Path(aPath.stripSuffix("/") + ".__exchange__")
    f.delete(tmp, true)
    require(f.rename(new Path(aPath), tmp), s"cannot move $aPath aside")
    require(f.rename(new Path(bPath), new Path(aPath)), s"cannot move $bPath")
    require(f.rename(tmp, new Path(bPath)), "cannot finish exchange")
  }

  /** Table TTL (homeworks/hw09.md:289-323): scheduled retention — delete
    * rows older than `retainDays` relative to `now`. When the table is
    * partitioned by day and the TTL aligns, prefer [[dropPartition]]
    * (`ttl_only_drop_parts` analogue).
    */
  def applyTtl(spark: SparkSession, tablePath: String, tsCol: String,
               retainDays: Int, now: java.sql.Timestamp,
               partitionBy: Seq[String] = Nil): Unit = {
    val cutoff = new java.sql.Timestamp(now.getTime - retainDays * 86400000L)
    delete(spark, tablePath, col(tsCol) < lit(cutoff), partitionBy)
  }

  /** Column TTL (lectures/lecture_07.md:174): expired rows keep the row
    * but reset the column to its default value — a scheduled UPDATE.
    */
  def applyColumnTtl(spark: SparkSession, tablePath: String, tsCol: String,
                     column: String, default: Column, retainDays: Int,
                     now: java.sql.Timestamp,
                     partitionBy: Seq[String] = Nil): Unit = {
    val cutoff = new java.sql.Timestamp(now.getTime - retainDays * 86400000L)
    update(spark, tablePath, col(tsCol) < lit(cutoff), Map(column -> default),
      partitionBy)
  }
}

/** BACKUP TABLE ... TO Disk / RESTORE (homeworks/hw13.md:44-158,
  * lectures/lecture_19.md:133-159): table snapshots as directory copies —
  * the FREEZE-hardlink analogue on a filesystem/object store.
  */
object Backup {
  private def fileUtilCopy(spark: SparkSession, from: String, to: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcFs = new Path(from).getFileSystem(conf)
    val dstFs = new Path(to).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(srcFs, new Path(from), dstFs, new Path(to),
      false, true, conf)
    ()
  }

  /** BACKUP TABLE path TO dest. */
  def backupTable(spark: SparkSession, tablePath: String, destPath: String): Unit =
    fileUtilCopy(spark, tablePath, destPath)

  /** RESTORE TABLE dest FROM backup (replaces current contents). */
  def restoreTable(spark: SparkSession, backupPath: String, tablePath: String): Unit = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(tablePath), true)
    fileUtilCopy(spark, backupPath, tablePath)
  }
}

/** OPTIMIZE TABLE ... FINAL / DEDUPLICATE (lectures/lecture_07.md:372-378):
  * materialize a FINAL fold back to storage, or drop exact duplicates.
  */
object Compaction {

  def optimizeFinal(spark: SparkSession, tablePath: String,
                    fold: DataFrame => DataFrame,
                    partitionBy: Seq[String] = Nil): Unit = {
    val folded = fold(spark.read.parquet(tablePath))
    val tmp = tablePath.stripSuffix("/") + ".__optimizing__"
    val f = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(tmp), true)
    val w = folded.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    f.delete(new Path(tablePath), true)
    f.rename(new Path(tmp), new Path(tablePath))
  }

  /** OPTIMIZE TABLE ... DEDUPLICATE [BY cols]. */
  def deduplicate(spark: SparkSession, tablePath: String,
                  byCols: Seq[String] = Nil, partitionBy: Seq[String] = Nil): Unit =
    optimizeFinal(spark, tablePath,
      df => if (byCols.isEmpty) df.dropDuplicates() else df.dropDuplicates(byCols),
      partitionBy)
}

/** ALTER TABLE schema evolution (homeworks/hw03.md:35-38,
  * lectures/lecture_08.md:90-129). ADD/DROP COLUMN are metadata-only —
  * exactly the reference's contract, where existing parts are untouched and
  * reads fill defaults — via a `_graft_schema.json` sidecar that
  * [[readTable]] applies: added columns surface with their default
  * expression on files that lack them (parquet mergeSchema covers files
  * written after the ALTER), dropped columns disappear from reads without
  * rewriting a byte. MATERIALIZE COLUMN / a physical drop are the explicit
  * rewrite ops, as in the reference.
  */
object SchemaEvolution {

  private def metaPath(tablePath: String) =
    new Path(tablePath.stripSuffix("/") + "/_graft_schema.json")

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** added: name → default SQL expression; dropped: names hidden. */
  final case class TableMeta(added: Map[String, String], dropped: Seq[String])

  private def readMeta(spark: SparkSession, tablePath: String): TableMeta = {
    val f = fs(spark, tablePath)
    val p = metaPath(tablePath)
    if (!f.exists(p)) return TableMeta(Map.empty, Nil)
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    parse(txt)
  }

  private def writeMeta(spark: SparkSession, tablePath: String, m: TableMeta): Unit = {
    val out = fs(spark, tablePath).create(metaPath(tablePath), true)
    try out.write(render(m).getBytes("UTF-8")) finally out.close()
  }

  // json4s (already on Spark's classpath) for the sidecar encoding
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def render(m: TableMeta): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "added" -> JObject(m.added.toList.sortBy(_._1)
        .map { case (k, v) => JField(k, JString(v)) }),
      "dropped" -> JArray(m.dropped.map(JString(_)).toList))))

  private def parse(txt: String): TableMeta = {
    val j = JsonMethods.parse(txt)
    val added = j \ "added" match {
      case JObject(fields) =>
        fields.collect { case JField(k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    val dropped = j \ "dropped" match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _          => Nil
    }
    TableMeta(added, dropped)
  }

  /** ALTER TABLE ADD COLUMN name DEFAULT expr — metadata-only, O(1). */
  def addColumn(spark: SparkSession, tablePath: String, name: String,
                defaultSql: String): Unit = {
    val m = readMeta(spark, tablePath)
    writeMeta(spark, tablePath,
      m.copy(added = m.added + (name -> defaultSql),
        dropped = m.dropped.filterNot(_ == name)))
  }

  /** ALTER TABLE DROP COLUMN — metadata-only, O(1). */
  def dropColumn(spark: SparkSession, tablePath: String, name: String): Unit = {
    val m = readMeta(spark, tablePath)
    writeMeta(spark, tablePath,
      m.copy(added = m.added - name, dropped = (m.dropped :+ name).distinct))
  }

  /** Read with schema evolution applied: mergeSchema across files, added
    * columns defaulted ONLY on files whose footer lacks them, dropped
    * columns hidden.
    *
    * Defaults are per-FILE, not per-value: a file written after the ALTER
    * returns its stored values unchanged — including explicit NULLs in a
    * Nullable added column (a blanket `coalesce(col, default)` would
    * silently rewrite those). Files are grouped by footer schema and each
    * group aligned to the merged schema (missing added columns get their
    * default, other missing columns get null), then unioned — the same
    * one-footer-read-per-file cost mergeSchema already pays.
    */
  def readTable(spark: SparkSession, tablePath: String): DataFrame = {
    val m = readMeta(spark, tablePath)
    val merged = spark.read.option("mergeSchema", "true").parquet(tablePath)
    val base =
      if (m.added.isEmpty) merged
      else {
        val files = merged.inputFiles.toSeq
        val groups = files.groupBy(f => spark.read.parquet(f).columns.toSet)
        groups.values.map { fs =>
          val part = spark.read
            .option("basePath", tablePath)
            .parquet(fs: _*)
          merged.schema.fields.foldLeft(part) { (acc, f) =>
            if (acc.columns.contains(f.name)) acc
            else if (m.added.contains(f.name))
              acc.withColumn(f.name, expr(m.added(f.name)).cast(f.dataType))
            else acc.withColumn(f.name, lit(null).cast(f.dataType))
          }.select(merged.columns.map(col).toSeq: _*)
        }.reduce(_.unionByName(_))
      }
    // a column added but never yet written by any file
    val withAdds = m.added.toSeq.sortBy(_._1).foldLeft(base) {
      case (acc, (name, dflt)) =>
        if (acc.columns.contains(name)) acc
        else acc.withColumn(name, expr(dflt))
    }
    m.dropped.foldLeft(withAdds)((acc, d) =>
      if (acc.columns.contains(d)) acc.drop(d) else acc)
  }

  /** ALTER TABLE ... MATERIALIZE COLUMN (and physically remove dropped
    * columns): one copy-on-write rewrite folding the sidecar into data.
    */
  def materialize(spark: SparkSession, tablePath: String,
                  partitionBy: Seq[String] = Nil): Unit = {
    val folded = readTable(spark, tablePath)
    val tmp = tablePath.stripSuffix("/") + ".__materializing__"
    val f = fs(spark, tablePath)
    f.delete(new Path(tmp), true)
    val w = folded.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    f.delete(new Path(tablePath), true)
    f.rename(new Path(tmp), new Path(tablePath))
  }

  /** ALTER TABLE ... MODIFY ORDER BY (lectures/lecture_08.md:90-129): a
    * resort-rewrite through [[TableLayout.writeSorted]] so footer-stat
    * pruning works against the NEW key — the real cost the reference also
    * pays (it only allows appending to the key without a rewrite).
    */
  def modifyOrderBy(spark: SparkSession, tablePath: String,
                    sortKeys: Seq[String],
                    partitionCol: Option[String] = None): Unit = {
    val df = readTable(spark, tablePath)
    val tmp = tablePath.stripSuffix("/") + ".__resorting__"
    val f = fs(spark, tablePath)
    f.delete(new Path(tmp), true)
    TableLayout.writeSorted(df, tmp, sortKeys, partitionCol)
    f.delete(new Path(tablePath), true)
    f.rename(new Path(tmp), new Path(tablePath))
  }
}
