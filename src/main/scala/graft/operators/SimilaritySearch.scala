package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.NativeFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - [[bruteForceTopK]]: exact baseline. Queries are broadcast (they're
  *    the small side by construction), so the corpus is scanned once with
  *    no shuffle of the vectors; only (query, id, score) tuples — not
  *    vectors — move in the final per-query top-k.
  *  - [[lshTopK]]: the scale path. Hyperplane-LSH bucket as blocking key;
  *    only same-bucket candidates are scored. Multi-probe (flipping one
  *    signature bit) recovers most boundary misses at ~bits× candidate
  *    cost.
  */
object SimilaritySearch {

  def cosine(a: Column, b: Column): Column = NativeFunctions.cosine(a, b)

  /** Exact top-k neighbors for each query vector (self-matches excluded
    * when ids collide). Output: (query id, rank, neighbor id, cosine).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     k: Int): DataFrame = {
    NativeFunctions.register(corpus.sparkSession)
    val scored = corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qVecCol))))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol),
        NativeFunctions.cosine(col(vecCol), col(qVecCol)).as("cosine"))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("cosine"))
  }

  /** LSH-bucketed ANN: `tables` independent hyperplane sets (standard
    * multi-table LSH); candidates share the query's bucket in ANY table —
    * or a 1-bit-flipped neighbor bucket when `multiProbe`. Miss probability
    * decays geometrically in `tables` at linear candidate cost.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              k: Int, bits: Int = 12, tables: Int = 4,
              multiProbe: Boolean = true): DataFrame = {
    NativeFunctions.register(corpus.sparkSession)
    val tableBuckets = (0 until tables).map(t =>
      struct(lit(t).as("tbl"), NativeFunctions.lshBucket(col(vecCol), bits, t).as("bucket")))
    val bucketed = corpus
      .select(col(idCol), col(vecCol), explode(array(tableBuckets: _*)).as("tb"))
      .select(col(idCol), col(vecCol), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val qProbes = (0 until tables).flatMap { t =>
      val qb = NativeFunctions.lshBucket(col(qVecCol), bits, t)
      val base = struct(lit(t).as("tbl"), qb.as("bucket"))
      if (!multiProbe) Seq(base)
      else base +: (0 until bits).map(i =>
        struct(lit(t).as("tbl"), qb.bitwiseXOR(lit(1 << i)).as("bucket")))
    }
    val probes = queries
      .select(col(qIdCol), col(qVecCol), explode(array(qProbes: _*)).as("tb"))
      .select(col(qIdCol), col(qVecCol), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val scored = bucketed.join(broadcast(probes), Seq("tbl", "bucket"))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol),
        NativeFunctions.cosine(col(vecCol), col(qVecCol)).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("cosine"))
  }
}
