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
