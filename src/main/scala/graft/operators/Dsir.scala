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
    * @return (id, llr) — Σ over the doc's in-vocab token occurrences of
    *         ln(p_target(tok)) − ln(p_raw(tok)); docs with no in-vocab
    *         tokens score 0.0
    */
  def importanceWeights(docs: DataFrame, id: Column, toks: Column,
                        targetPred: Column, vocabSize: Int): DataFrame = {
    val exploded = docs
      .select(id.as("__id"), targetPred.as("__t"), explode(toks).as("__tok"))
    val counts = exploded.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
    val vocab = counts.orderBy(col("__cr").desc, col("__tok")).limit(vocabSize)
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
    val scores = exploded.join(broadcast(model), "__tok")
      .groupBy(col("__id")).agg(sum(col("__w")).as("__llr"))
    docs.select(id.as("__id"))
      .join(scores, Seq("__id"), "left")
      .select(col("__id").as("id"),
        coalesce(col("__llr"), lit(0.0)).as("llr"))
  }
}
