package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.SimilaritySearch
import graft.tables.Tables

/** Dev tool: ANN recall@k / latency trade-off on the embeddings table —
  * brute force (exact ground truth) vs multi-table LSH vs IVF, printed as
  * one JSON line per variant. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.ProfileAnn'
  *
  * Reading the numbers: the fixture's embeddings are UNIFORM RANDOM, so a
  * query's true top-10 sit at cosine ≈ 0.2–0.3 — not "near" in the LSH
  * sense. Hyperplane LSH's collision probability 1-θ/π only concentrates
  * for genuinely close vectors, so low recall HERE is the textbook
  * behavior, not a bug; on the near-dup workload it exists for (planted
  * twins at cosine ≥ 0.95 — SimilaritySpec/DedupSpec) its recall is ~1.
  * IVF degrades more gracefully on random data because nProbe/nLists is a
  * direct fraction of the corpus scanned. sf0.1's 2000×64-dim corpus also
  * makes per-job overhead dominate the latency column; the shapes (bucket
  * join vs full scan) are what matter at scale, per-query wall-time here
  * is not the signal.
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = 10
    val nQueries = 20
    val spark = GraftSession.create(master = "local[4]")
    val emb = Tables(spark, sfDir).embeddings.cache()
    emb.count()
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")).cache()
    queries.count()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val (truth, tBrute) = timed(pairs(
      SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "query_id", "qv", k)))
    def report(name: String, got: Set[(Long, Long)], sec: Double): Unit = {
      val recall = got.intersect(truth).size.toDouble / truth.size
      println(f"""{"variant":"$name","recall_at_$k":$recall%.3f,"sec":$sec%.2f}""")
    }
    report("brute_force", truth, tBrute)

    for ((bits, tables) <- Seq((10, 2), (10, 4), (12, 4))) {
      val (got, t) = timed(pairs(
        SimilaritySearch.lshTopK(emb, "vec_id", "embedding",
          queries, "query_id", "qv", k, bits = bits, tables = tables)))
      report(s"lsh_b${bits}_t$tables", got, t)
    }
    for ((nLists, nProbe) <- Seq((16, 2), (16, 4), (32, 8))) {
      val (got, t) = timed(pairs(
        SimilaritySearch.ivfTopK(emb, "vec_id", "embedding",
          queries, "query_id", "qv", k, nLists = nLists, nProbe = nProbe)))
      report(s"ivf_l${nLists}_p$nProbe", got, t)
    }
    // PQ: full-scan ADC (recall loss = quantization only) and IVF-PQ
    // (adds cell pruning). m=8 on 64-dim = 32x memory compression.
    for ((m, ksub) <- Seq((8, 16), (8, 64), (16, 64))) {
      val (got, t) = timed(pairs(
        SimilaritySearch.pqTopK(emb, "vec_id", "embedding",
          queries, "query_id", "qv", k, m = m, ksub = ksub)))
      report(s"pq_m${m}_k$ksub", got, t)
    }
    for ((nLists, nProbe, m, ksub) <- Seq((16, 4, 8, 64), (16, 8, 8, 64))) {
      val (got, t) = timed(pairs(
        SimilaritySearch.ivfPqTopK(emb, "vec_id", "embedding",
          queries, "query_id", "qv", k, nLists = nLists, nProbe = nProbe,
          m = m, ksub = ksub)))
      report(s"ivfpq_l${nLists}_p${nProbe}_m${m}_k$ksub", got, t)
    }
    spark.stop()
  }
}
