package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming near-dup filtering: every micro-batch runs through
  * [[Dedup.incrementalNearDedup]] with the micro-batch id as the
  * increment id. Because increments are idempotent (a replayed id
  * excludes its own store partition and overwrites its own output
  * partition), a restart that replays the last uncommitted batch
  * produces the identical survivor set — EXACTLY-ONCE filtering from
  * at-least-once batch delivery, with no state store: the dedup memory
  * is the parquet bucket store, shared with any batch backfill jobs
  * running the same operator.
  */
object StreamingDedup {

  def nearDupFilterStream(stream: DataFrame, idCol: String, textCol: String,
                          storePath: String, outputPath: String,
                          checkpoint: String,
                          nGram: Int = 3, numHashes: Int = 64,
                          bands: Int = 16): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pinned = batch.persist()
        try {
          Dedup.incrementalNearDedup(pinned, idCol, textCol, storePath,
            incrementId = s"b$batchId", nGram = nGram,
            numHashes = numHashes, bands = bands,
            outputPath = Some(outputPath))
          ()
        } finally { pinned.unpersist(); () }
      }
      .start()
}
