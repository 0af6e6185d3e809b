package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for LLM training pipelines: documents are
  * laid out end-to-end in id order and cut into fixed-`budget`-token
  * sequences (the standard concat-and-chunk scheme).
  *
  * The global token offset of each document is a distributed TWO-PHASE
  * prefix sum — not a single global window (an un-partitioned window
  * funnels the whole corpus through one reducer):
  *
  *   1. range-repartition by id, then reduce each partition to one
  *      (partition, token-total) row; the driver cumsums that — O(#parts)
  *      state, a few KB even with 100k partitions;
  *   2. a within-partition running sum (bounded window) plus the broadcast
  *      partition offset reconstructs the exact global prefix sum.
  *
  * So the only corpus-sized work is one range shuffle and one
  * per-partition sort — the same cost as writing a sorted table.
  */
object Packing {

  /** Assign every document its packed position: `seq_id`/`seq_offset` of
    * its first token and `end_seq_id` of its last, under `budget` tokens
    * per training sequence. Documents longer than `budget` span sequences
    * (concat-and-chunk semantics; zero-token docs occupy their start
    * position). Deterministic: layout order is `idCol` ascending.
    */
  def concatChunk(df: DataFrame, idCol: String, tokCol: String,
                  budget: Int, targetPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val n = if (targetPartitions > 0) targetPartitions
            else spark.sessionState.conf.numShufflePartitions
    // localCheckpoint pins the partition assignment so phase 1's totals
    // describe exactly the partitions phase 2 windows over
    // null token counts fold to 0 — an all-null partition would otherwise
    // NPE the driver-side totals read, and null starts poison downstream
    val parted = df
      .select(col(idCol), coalesce(col(tokCol).cast("long"), lit(0L)).as("__tok"))
      .repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = parted.groupBy(col("__pid")).agg(sum(col("__tok")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = totals.keys.toSeq.sorted.map { p =>
      val o = acc; acc += totals(p); (p, o)
    }
    val offDf = spark.createDataFrame(offsets).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.join(broadcast(offDf), "__pid")
      .withColumn("__start", col("__off") + coalesce(sum(col("__tok")).over(w), lit(0L)))
      .select(col(idCol),
        col("__tok").as("n_tokens"),
        expr(s"__start DIV ${budget}L").as("seq_id"),
        (col("__start") % budget).as("seq_offset"),
        expr(s"(__start + greatest(__tok, 1L) - 1L) DIV ${budget}L").as("end_seq_id"))
  }

  /** The MATERIALIZED packed output — what a training pipeline actually
    * writes: one row per (sequence, document-slice), i.e. each training
    * sequence's ordered token slices with document provenance. Derived
    * from [[concatChunk]]'s layout coordinates by exploding each doc's
    * (bounded) spanned-sequence range; fully deterministic, so it is
    * oracle-checkable. `seq_off` is the slice's start within the
    * sequence, `doc_off` its start within the document; empty slices
    * (zero-token docs) are dropped — a sequence carries tokens only.
    */
  def packedSlices(packed: DataFrame, idCol: String, budget: Int): DataFrame = {
    val spans = packed
      .withColumn("__start", col("seq_id") * budget + col("seq_offset"))
      .withColumn("__seq", explode(sequence(col("seq_id"), col("end_seq_id"))))
    spans
      .withColumn("__s", greatest(col("__seq") * budget, col("__start")))
      .withColumn("__e", least((col("__seq") + lit(1)) * budget,
        col("__start") + col("n_tokens")))
      .filter(col("__e") > col("__s"))
      .select(col("__seq").as("seq_id"),
        (col("__s") - col("__seq") * budget).as("seq_off"),
        col(idCol),
        (col("__s") - col("__start")).as("doc_off"),
        (col("__e") - col("__s")).as("len"))
  }

  /** Overlapping token-window chunking — RAG/embedding prep: one row per
    * chunk with provenance, consecutive chunks sharing `overlap` tokens
    * so no boundary context is lost. Stride = maxTokens - overlap; a doc
    * of n tokens yields 1 chunk when n <= maxTokens, else
    * ceil((n - maxTokens) / stride) + 1 (the last may be shorter, never
    * empty); zero-token docs yield zero chunks. Pure map-side
    * (sequence + posexplode) — no shuffle, so it scales as a plain
    * corpus pass.
    *
    * Output: (idCol, chunk_id, start_tok, n_toks, chunk) — `start_tok`
    * 0-based, `chunk` the space-joined token window.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap max=$maxTokens")
    val stride = maxTokens - overlap
    val toks = split(trim(regexp_replace(col(textCol), "\\s+", " ")), " ")
    val n = size(toks)
    val nChunks = when(n === 1 && element_at(toks, 1) === "", lit(0))
      .when(n <= maxTokens, lit(1))
      .otherwise(ceil((n - maxTokens).cast("double") / stride)
        .cast("int") + 1)
    df.select(col(idCol), toks.as("__toks"), n.as("__n"), nChunks.as("__nc"))
      .filter(col("__nc") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__nc") - 1)).as(Seq("chunk_id", "__k")))
      .select(col(idCol), col("chunk_id"),
        (col("__k") * stride).as("start_tok"),
        least(lit(maxTokens), col("__n") - col("__k") * stride).as("n_toks"),
        array_join(slice(col("__toks"), col("__k") * stride + 1,
          lit(maxTokens)), " ").as("chunk"))
  }

  /** Sequence-level fill report for a packed layout: tokens landing in
    * each training sequence (last sequence may be ragged). Derived from
    * the same prefix sums, aggregated by sequence id — one extra shuffle
    * keyed on `seq_id`.
    */
  def sequenceFill(packed: DataFrame, budget: Int): DataFrame = {
    // per-doc token count clipped to each sequence it spans is awkward in
    // one pass; total fill per seq_id is enough for pipeline monitoring:
    // a doc contributes min(end, seqEnd) - max(start, seqStart) tokens to
    // each spanned sequence. Explode the (small) span range per doc.
    val spans = packed
      .withColumn("__seq", explode(sequence(col("seq_id"), col("end_seq_id"))))
    spans
      .withColumn("__s", greatest(col("__seq") * budget,
        col("seq_id") * budget + col("seq_offset")))
      .withColumn("__e", least((col("__seq") + lit(1)) * budget,
        col("seq_id") * budget + col("seq_offset") + col("n_tokens")))
      .groupBy(col("__seq").as("seq_id"))
      .agg(sum(greatest(col("__e") - col("__s"), lit(0L))).as("fill_tokens"),
        count(lit(1)).as("n_docs"))
  }
}
