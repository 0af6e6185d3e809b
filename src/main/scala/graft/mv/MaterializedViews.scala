package graft.mv

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Materialized views as INSERT triggers (SURVEY.md §2.12;
  * lectures/lecture_13.md:7-43): an MV transforms each *inserted block*
  * and appends the result to its target — it never touches existing rows.
  * Cascades (MV reading an MV's target, clusters/ch_and_kafka) are
  * expressed by chaining pipelines.
  */
final case class MaterializedView(
    name: String,
    transform: DataFrame => DataFrame,
    targetPath: String)

/** The ingest path of one source table: every [[insert]] writes the raw
  * block to `rawPath` (pass None for an ENGINE=Null source,
  * lectures/lecture_13.md:376 — rows discarded, MVs still fire) and fans
  * the block out through all attached MVs.
  */
final class IngestPipeline(
    rawPath: Option[String],
    mvs: Seq[MaterializedView]) {

  // Both layout guards go through the Hadoop FileSystem resolved from
  // the session — java.io.File silently reports "no children" for any
  // non-local scheme (hdfs://, s3a://), which would let the exact
  // corruption the guards exist to prevent proceed on a real cluster.
  private def fs(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  private def holdsBatchDirs(spark: SparkSession, p: String): Boolean = {
    val (hfs, path) = fs(spark, p)
    hfs.exists(path) && hfs.listStatus(path).exists(
      _.getPath.getName.startsWith("batch="))
  }

  /** A flat Append into a target that already holds `batch=<id>`
    * subdirectories (written by [[attachToStream]]) corrupts partition
    * discovery for every reader of the target root — refuse it, the
    * mirror of the fresh-checkpoint guard below.
    */
  private def requireFlatLayout(spark: SparkSession, p: String,
                                via: String): Unit =
    require(!holdsBatchDirs(spark, p),
      s"$via: target '$p' already holds batch= directories written by " +
        "attachToStream — a flat append would corrupt partition " +
        "discovery for readers of the target root. Keep streaming " +
        "targets and batch-insert targets separate.")

  def insert(block: DataFrame): Unit = {
    val spark = block.sparkSession
    (rawPath.toSeq ++ mvs.map(_.targetPath))
      .foreach(requireFlatLayout(spark, _, "insert"))
    rawPath.foreach(p => block.write.mode(SaveMode.Append).parquet(p))
    mvs.foreach { mv =>
      mv.transform(block).write.mode(SaveMode.Append).parquet(mv.targetPath)
    }
  }

  /** CREATE MATERIALIZED VIEW ... POPULATE (lectures/lecture_09.md:668-768):
    * one backfill batch over the existing raw table.
    */
  def populate(spark: SparkSession, mv: MaterializedView): Unit =
    rawPath.foreach { p =>
      requireFlatLayout(spark, mv.targetPath, "populate")
      mv.transform(spark.read.parquet(p)).write.mode(SaveMode.Append).parquet(mv.targetPath)
    }

  /** Streaming attachment: the same MV fan-out driven by a stream
    * (the reference's Kafka-consuming MV, lectures/lecture_09.md:920-925).
    * One foreachBatch writes raw + all targets per micro-batch.
    *
    * EXACTLY-ONCE at any kill point (the upgrade over the reference's
    * at-least-once consumer): each sink's micro-batch output goes to a
    * batchId-addressed subdirectory (`target/batch=<id>`) in OVERWRITE
    * mode. Structured Streaming replays an uncommitted batch with the
    * same batchId and data after a restart, so a crash ANYWHERE inside
    * the fan-out — even after some sinks already wrote — rewrites those
    * sinks' own directories instead of appending a second copy. A plain
    * append here would duplicate the already-written sinks on every
    * mid-batch failure. Readers see `batch` as a discovered partition
    * column over the target root; [[insert]] and [[populate]] REFUSE a
    * target already holding `batch=` directories (mixed layouts break
    * partition discovery), the mirror of the fresh-checkpoint guard.
    */
  def attachToStream(stream: DataFrame, checkpoint: String): StreamingQuery = {
    // refuse a FRESH checkpoint over targets that already hold batch
    // data: Structured Streaming restarts batchIds at 0 under a new
    // checkpoint, and the idempotent overwrite below would then
    // DESTROY the old batches instead of appending after them
    val spark = stream.sparkSession
    val hasOffsets = {
      val (hfs, cp) = fs(spark, checkpoint)
      hfs.exists(new org.apache.hadoop.fs.Path(cp, "offsets"))
    }
    if (!hasOffsets) {
      val dirty = (rawPath.toSeq ++ mvs.map(_.targetPath))
        .filter(holdsBatchDirs(spark, _))
      require(dirty.isEmpty,
        s"attachToStream: checkpoint '$checkpoint' has no offsets but " +
          s"these targets already hold batch data: ${dirty.mkString(", ")}" +
          " — batch ids would restart at 0 and overwrite them. Resume " +
          "with the original checkpoint, or point at fresh target paths.")
    }
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (block: DataFrame, batchId: Long) =>
        val cached = block.persist()
        try {
          rawPath.foreach(p => cached.write.mode(SaveMode.Overwrite)
            .parquet(s"$p/batch=$batchId"))
          mvs.foreach { mv =>
            mv.transform(cached).write.mode(SaveMode.Overwrite)
              .parquet(s"${mv.targetPath}/batch=$batchId")
          }
        } finally { cached.unpersist(); () }
        ()
      }
      .start()
  }
}
