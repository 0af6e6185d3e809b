package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-partitioned inverted index (term -> sorted posting list), the
  * IR-side sibling of the skip/bloom indexes in [[graft.mergetree]]: maps
  * a tokenized corpus to `(term, shard, df_shard, postings)` rows.
  *
  * Scale shape: postings are sharded by DOCUMENT id range (`doc_id >>
  * shardBits`) — the standard document-partitioned layout — so no single
  * output row grows with corpus size: a stop-word's postings split across
  * shards, each bounded by the shard's document count. The build is one
  * explode + one groupBy (term, shard) — per-shard sorted lists come from
  * `sort_array` on the grouped collection, never a global or per-term
  * window (a per-term window funnels every stop-word posting through one
  * reducer). Query-side, a term lookup is a broadcast semi-join on term
  * that prunes to the matching rows and unions shard postings.
  */
object InvertedIndex {

  /** Build the index. `terms` must be the pre-tokenized array column;
    * duplicate terms within a document collapse (df semantics).
    *
    * @param shardBits documents per shard = 2^shardBits; the default 40
    *                  puts every doc id below 2^40 in shard 0 (single-
    *                  shard mode — exact global df as `df_shard`).
    */
  def build(docs: DataFrame, id: Column, terms: Column,
            minDfShard: Long = 1L, shardBits: Int = 40): DataFrame = {
    require(shardBits >= 0 && shardBits <= 62, s"bad shardBits $shardBits")
    docs
      .select(id.cast("long").as("doc_id"),
        explode(array_distinct(terms)).as("term"))
      .groupBy(col("term"),
        shiftright(col("doc_id"), shardBits).cast("long").as("shard"))
      .agg(count(lit(1)).as("df_shard"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
      .filter(col("df_shard") >= minDfShard)
  }

  /** Documents containing ANY of `queryTerms`: broadcast the term set,
    * prune index rows, union + dedup shard postings. Output: (term,
    * doc_id) match pairs.
    */
  def lookup(index: DataFrame, queryTerms: Seq[String]): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    index.join(broadcast(queryTerms.toDF("term")), "term")
      .select(col("term"), explode(col("postings")).as("doc_id"))
  }

  /** BM25 ranked retrieval (Robertson/Okapi, the Lucene idf variant:
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`): score every document
    * containing at least one query term. Output: `(doc_id, score)`.
    *
    * Scale shape: the query-term filter runs INSIDE the token array
    * (`filter` before `explode`), so the exploded stream carries only
    * query-term hits — corpus-sized rows never shuffle. One (doc_id,
    * term) partial-aggregating shuffle computes tf; df is |query| rows
    * and joins back by broadcast; corpus size and mean length are a
    * single bounded scalar aggregate. No per-term reducer funnels:
    * a stop-word query term costs its hit count, spread across the
    * doc-keyed shuffle.
    */
  def bm25Rank(docs: DataFrame, id: Column, terms: Column,
               queryTerms: Seq[String], k1: Double = 1.2,
               b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Rank needs at least one query term")
    val q = lit(queryTerms.toArray)
    // ONE corpus pass: every doc projects to (doc_id, dl, hits), where
    // hits keeps only query-term tokens (filtered INSIDE the array before
    // any explode — corpus-sized rows never shuffle). PINNED, because
    // three consumers otherwise each re-ran the corpus scan+tokenize: the
    // scalar stats head(), the tf aggregation, and the df broadcast side
    // (which re-derived tf from the raw corpus — two full corpus passes
    // inside the one scoring action, plus the stats pass). The pinned
    // rows are a lightweight proxy — two numbers plus the query-term
    // hits — the guide-§8 "decide with small rows" shape.
    val proj = org.apache.spark.sql.graftinternal.Rematerialize(
      docs.select(id.cast("long").as("doc_id"), terms.as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
          filter(col("toks"), t => array_contains(q, t)).as("hits")))
    // one scalar row: corpus size + mean doc length (closure-shipped)
    val stats = proj.agg(count(lit(1)), avg(col("dl"))).head()
    val n = stats.getLong(0).toDouble
    val avgdl = stats.getDouble(1)
    val tf = proj
      .select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), "term")
      .withColumn("idf",
        log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy(col("doc_id")).agg(sum(col("contrib")).as("score"))
  }
}
