package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023): score raw
  * documents by the log-likelihood ratio of a target unigram model over a
  * raw unigram model, both add-one-smoothed bag-of-words fits over a
  * bounded shared vocabulary. Documents whose tokens look more like the
  * target distribution than the raw pool score positive; resampling on
  * these weights steers a 100 TB crawl toward a curated target domain.
  *
  * Scale shape: the fit is two aggregations over the exploded token
  * stream (full-cardinality keys — no reducer funnel); the vocabulary is
  * a `TakeOrderedAndProject` bounded at `vocabSize` with a deterministic
  * (count desc, token asc) tie-break; the model is V rows and ships by
  * broadcast, so scoring is a map-side join plus ONE shuffle on the doc
  * key. Nothing driver-side exceeds O(vocabSize).
  */
object Dsir {

  /** Per-document DSIR importance log-weight.
    *
    * @param docs       corpus
    * @param id         document key column
    * @param toks       token-array column (pre-normalized)
    * @param targetPred boolean column marking the target-distribution docs
    * @param vocabSize  model vocabulary bound
    * @param emitTokenCount also output `n_toks` (the doc's token count)
    *        from the SAME scoring pass — a caller wanting both the
    *        weight and the count must not pay a second tokenize plus a
    *        doc-key join
    * @return (id, llr) — Σ over the doc's in-vocab token occurrences of
    *         ln(p_target(tok)) − ln(p_raw(tok)); docs with no in-vocab
    *         tokens score 0.0 — plus `n_toks` when requested
    */
  def importanceWeights(docs: DataFrame, id: Column, toks: Column,
                        targetPred: Column, vocabSize: Int,
                        emitTokenCount: Boolean = false): DataFrame = {
    // explode_outer keeps zero-token docs as one null-token row, so
    // every doc reaches the scoring aggregation directly — no recovery
    // join against the corpus afterward (one shuffle and one corpus
    // scan fewer than the fit-then-join shape)
    val exploded = docs.select(id.as("__id"), targetPred.as("__t"),
      explode_outer(toks).as("__tok"))
    val counts = exploded.where(col("__tok").isNotNull)
      .groupBy(col("__tok"))
      .agg(count(lit(1)).as("__cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
    // PINNED: vocab is <= vocabSize rows, but its plan holds the full
    // corpus explode+aggregate — and it feeds BOTH the totals aggregate
    // and the model projection, two subtrees whose re-evaluation each
    // re-ran the corpus fit inside the one scoring action. Pinning costs
    // one bounded job and leaves exactly two corpus passes per action
    // (fit + score), the operator's floor.
    val vocab = org.apache.spark.sql.graftinternal.Rematerialize(
      counts.orderBy(col("__cr").desc, col("__tok")).limit(vocabSize))
    // totals over the SHARED vocab make both models proper distributions
    // on the same support; one broadcast row
    val totals = vocab.agg(
      sum(col("__cr")).cast("double").as("__nr"),
      sum(col("__ct")).cast("double").as("__nt"),
      count(lit(1)).cast("double").as("__vn"))
    val model = vocab.crossJoin(broadcast(totals))
      .select(col("__tok"),
        (log((col("__ct") + 1.0) / (col("__nt") + col("__vn"))) -
          log((col("__cr") + 1.0) / (col("__nr") + col("__vn")))).as("__w"))
    // broadcast LEFT join: an out-of-vocab token scores 0 but still
    // counts toward n_toks, so the weight and the token count fall out
    // of ONE groupBy over the same token stream
    val scores = exploded.join(broadcast(model), Seq("__tok"), "left")
      .groupBy(col("__id"))
      .agg(sum(coalesce(col("__w"), lit(0.0))).as("__llr"),
        count(col("__tok")).as("__n"))
    val base = scores.select(col("__id").as("id"),
      col("__n").as("n_toks"),
      coalesce(col("__llr"), lit(0.0)).as("llr"))
    if (emitTokenCount) base else base.drop("n_toks")
  }
}
