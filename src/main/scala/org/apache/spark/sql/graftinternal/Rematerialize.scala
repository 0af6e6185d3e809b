package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** Stats-free eager re-materialization for iterative DataFrame algorithms.
  *
  * `Dataset.localCheckpoint` alone is not enough for a join-per-round
  * loop: `LogicalRDD.fromDataset` carries the originating plan's
  * size-in-bytes estimate onto the checkpointed relation, so each round's
  * self-join SQUARES the estimate — after ~10 rounds Catalyst is
  * multiplying million-bit BigIntegers inside stats estimation and
  * planning stalls for minutes (observed empirically on the d09
  * clustering loop at sf0.1).
  *
  * The public workaround (`createDataFrame(ck.rdd, schema)`) resets the
  * stats but pays a Row ⇄ InternalRow conversion on every downstream
  * read. This shim uses the spark.sql-package-private
  * `internalCreateDataFrame` to rewrap the checkpointed InternalRow RDD
  * directly — zero-copy, default stats. It lives under
  * `org.apache.spark.sql` for that access and contains no other logic.
  */
object Rematerialize {

  /** Fast default: executor-local checkpoint. Blocks live in executor
    * block managers only — an executor loss after lineage truncation is
    * unrecoverable (the job restarts from the caller's round 0). Use
    * [[reliable]] periodically in long iterative loops when that failure
    * mode matters.
    */
  def apply(df: DataFrame): DataFrame = rewrap(df.localCheckpoint())

  /** Durable re-materialization: a RELIABLE checkpoint to
    * `sparkContext.getCheckpointDir` (HDFS/object store on a cluster).
    * Contract: after this returns, the frame's data survives any executor
    * loss — recomputation reads the checkpoint files instead of replaying
    * lineage, so an iterative loop that calls this every N rounds bounds
    * its replay window to N rounds. Requires `setCheckpointDir`; throws
    * otherwise (same as `Dataset.checkpoint`).
    */
  def reliable(df: DataFrame): DataFrame = rewrap(df.checkpoint())

  private def rewrap(ck: DataFrame): DataFrame = {
    val spark = ck.sparkSession.asInstanceOf[classic.SparkSession]
    val classicCk = ck.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    spark.internalCreateDataFrame(classicCk.queryExecution.toRdd, ck.schema)
  }
}
