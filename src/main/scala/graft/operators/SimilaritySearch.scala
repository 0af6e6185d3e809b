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

  /** IVF ANN: corpus clustered into `nLists` cells (k-means on a sample,
    * deterministic seed); queries probe the `nProbe` nearest cells only.
    * The inverted-file structure is a bucketed table — at scale, write it
    * out partitioned by cell so probes prune partitions.
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              k: Int, nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    NativeFunctions.register(corpus.sparkSession)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = corpus.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol)).as("features"))
    val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(10)
      .fit(featured.select(col("features")))
    val centers: Array[Array[Float]] =
      model.clusterCenters.map(_.toArray.map(_.toFloat))
    def cosToCenters(v: Column): Column =
      array(centers.map(c => NativeFunctions.cosine(v, typedlit(c.toSeq))): _*)
    // (cos, idx) pairs sorted by cos desc; cell of a vector = best idx
    val ranked =
      "array_sort(transform(sequence(1, size(__cs)), " +
        "i -> struct(element_at(__cs, i) AS c, i AS i)), " +
        "(a, b) -> CASE WHEN a.c > b.c THEN -1 WHEN a.c < b.c THEN 1 ELSE 0 END)"
    val bucketed = corpus
      .withColumn("__cs", cosToCenters(col(vecCol)))
      .withColumn("cell", expr(s"element_at($ranked, 1).i"))
      .drop("__cs")
    val probes = queries
      .withColumn("__cs", cosToCenters(col(qVecCol)))
      .withColumn("cell",
        explode(expr(s"transform(slice($ranked, 1, $nProbe), x -> x.i)")))
      .drop("__cs")
    val scored = bucketed.join(broadcast(probes), Seq("cell"))
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
