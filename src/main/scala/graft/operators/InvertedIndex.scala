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
}
