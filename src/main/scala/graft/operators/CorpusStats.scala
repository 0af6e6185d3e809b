package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus-level term statistics for training-data curation: TF-IDF (the
  * classic tf·ln(N/df) weighting) over any tokenized text column.
  *
  * Scale shape: one explode (map-side), a (doc, term) partial+final
  * hash aggregation, a term-keyed aggregation for document frequency,
  * and a broadcast of the single-row corpus count — no driver-side
  * corpus state, nothing keyed on a low-cardinality column. Both big
  * joins are keyed on `term` / `idCol` with full key cardinality.
  */
object CorpusStats {

  /** Per-(doc, term) counts + TF-IDF. `toksCol` is any array<string>
    * expression (e.g. `NativeFunctions.normTokens(col("text"))`).
    * Output: idCol, term, tf_count, doc_len, df, n_docs, tfidf.
    */
  def tfidf(docs: DataFrame, idCol: String, toksCol: Column): DataFrame = {
    val terms = docs.select(col(idCol), explode(toksCol).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf_count"))
    val docLen = terms.groupBy(col(idCol)).agg(count(lit(1)).as("doc_len"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = terms.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(docLen, Seq(idCol))
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        (col("tf_count").cast(DoubleType) / col("doc_len").cast(DoubleType)) *
          log(col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)))
  }

  /** Char-n-gram LM quality scoring — the CCNet-style perplexity filter:
    * train add-one-smoothed n-gram counts on the corpus, then score every
    * document by its average negative log-likelihood under that model
    * (high = unusual character statistics = likely junk).
    *
    * The model is BOUNDED BY CONSTRUCTION: normalized text draws from a
    * 37-symbol alphabet ([a-z0-9 ]), so the count table holds at most
    * 37^n grams (~50k for n=3) regardless of corpus size — it broadcasts
    * at 100 TB exactly as it does at test scale. One shuffle to count,
    * one broadcast join to score, one doc-keyed aggregate.
    *
    * `nll` is rounded to 4 decimals: the per-doc mean sums doubles whose
    * addition order differs across engines/partitionings (same dodge as
    * [[tfidf]]'s oracle).
    */
  def perplexityScore(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    graft.plans.NativeFunctions.register(docs.sparkSession)
    val norm = graft.plans.NativeFunctions.normText(col(textCol))
    // pinned: the exploded gram stream feeds BOTH the model count and the
    // scoring join — without it the normalize+explode pass runs twice
    val grams = org.apache.spark.sql.graftinternal.Rematerialize(docs
      .select(col(idCol), norm.as("__norm"))
      .filter(length(col("__norm")) >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(1), length(col("__norm")) - (n - 1)),
        i => col("__norm").substr(i, lit(n)))).as("__g")))
    val counts = grams.groupBy(col("__g")).agg(count(lit(1)).as("__c"))
    val totals = counts.agg(sum(col("__c")).as("__n"), count(lit(1)).as("__v"))
    grams.join(broadcast(counts), Seq("__g"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        round(avg(-log(
          (coalesce(col("__c"), lit(0L)) + 1).cast(DoubleType) /
            (col("__n") + col("__v")).cast(DoubleType))), 4).as("nll"))
  }

  /** Corpus vocabulary report: per-term document frequency, collection
    * frequency, and IDF — the side table a curation pipeline keeps for
    * stopword mining and rare-term filtering.
    */
  def vocabulary(docs: DataFrame, idCol: String, toksCol: Column): DataFrame = {
    val terms = docs.select(col(idCol), explode(toksCol).as("term"))
    val nDocs = terms.select(countDistinct(col(idCol)).as("n_docs"))
    terms.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"), count(lit(1)).as("cf"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", log(col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)))
      .drop("n_docs")
  }
}
