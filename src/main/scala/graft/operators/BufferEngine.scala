package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ENGINE=Buffer / async_insert (SURVEY.md §2.1;
  * lectures/lecture_09.md:77-206): small inserts accumulate in RAM and
  * flush to the target table when row/age thresholds trip — trading
  * durability for ingest amortization, exactly the reference's contract
  * (reads see buffered rows; a crash loses the buffer).
  *
  * Batch-side analogue of the streaming path's trigger interval. Not
  * thread-safe by design (one writer per buffer, as in the reference).
  */
final class BufferEngine(
    spark: SparkSession,
    targetPath: String,
    maxRows: Long = 100000,
    maxAgeMs: Long = 60000,
    clock: () => Long = () => System.currentTimeMillis()) {

  private var pending: Vector[DataFrame] = Vector.empty
  private var pendingRows: Long = 0L
  private var oldestInsertAt: Long = -1L

  def insert(block: DataFrame): Unit = {
    val cached = block.persist()
    val n = cached.count() // materialize now: Buffer owns the data from here
    pending :+= cached
    pendingRows += n
    if (oldestInsertAt < 0) oldestInsertAt = clock()
    maybeFlush()
  }

  def bufferedRows: Long = pendingRows

  private def maybeFlush(): Unit = {
    val aged = oldestInsertAt >= 0 && clock() - oldestInsertAt >= maxAgeMs
    if (pendingRows >= maxRows || aged) flush()
  }

  /** Force-flush (OPTIMIZE TABLE on a Buffer table). */
  def flush(): Unit = {
    if (pending.nonEmpty) {
      pending.reduce(_ unionByName _)
        .write.mode(SaveMode.Append).parquet(targetPath)
      pending.foreach(_.unpersist())
      pending = Vector.empty
      pendingRows = 0L
      oldestInsertAt = -1L
    }
  }

  /** Reads through a Buffer table see target + buffered rows
    * (lectures/lecture_09.md: reads merge the buffer).
    */
  def read(): DataFrame = {
    val target =
      try spark.read.parquet(targetPath)
      catch { case _: Throwable => null } // target not yet created
    (Option(target).toVector ++ pending) match {
      case Vector() => spark.emptyDataFrame
      case parts => parts.reduce(_ unionByName _)
    }
  }
}
