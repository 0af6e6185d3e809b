package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage profiler for the d03c production pipeline (round-9
  * measurement aid; not part of the library surface).
  */
object ProfileD03c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.GraftSession.create(
      master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.NativeFunctions.register(spark)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.tables.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))

    val n = timed("count")(corpus.count())
    // the same derivation minhashNearDupPairsAuto runs, so the per-stage
    // timings match the full pipeline on ANY corpus size
    val rows = graft.operators.Dedup.lshBitsFor(n, 50)
    val numHashes = rows * 16
    println(s"n=$n numHashes=$numHashes")

    val sigs = graft.operators.Dedup.minhashSignatures(
      corpus, "doc_id", "text", 3, numHashes)
    timed("signatures (agg force)") {
      sigs.select(max(element_at(col("sig"), 1))).head()
    }
    val cands = timed("candidates + checkpoint") {
      graft.operators.Dedup.minhashCandidatePairs(
        sigs, "doc_id", numHashes, 16).localCheckpoint()
    }
    println(s"candidates=${cands.count()}")
    val verified = timed("verify") {
      graft.operators.Dedup.jaccardVerify(cands, corpus, "doc_id", "text", 3)
        .filter(col("jaccard") >= 0.5).count()
    }
    println(s"verified pairs=$verified")
    timed("full pipeline 2nd run") {
      graft.operators.Dedup.minhashNearDupPairsAuto(
        corpus, "doc_id", "text", threshold = 0.5, targetBucketSize = 50,
        knownCount = n).count()
    }
    spark.stop()
  }
}
