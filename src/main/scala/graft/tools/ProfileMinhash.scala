package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import graft.tables.Tables

/** Dev tool: stage-by-stage timing of the MinHash-LSH pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create(master = "local[32]")
    val docs = Tables(spark, sfDir).documents
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $label: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(docs.count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    time("signatures")(sigs.count())
    val sigsC = sigs.cache()
    time("signatures_cached")(sigsC.count())
    val cands = Dedup.minhashCandidatePairs(sigsC, "doc_id")
    time("candidates")(println("[prof] cands=" + cands.count()))
    val verified = Dedup.jaccardVerify(cands, docs, "doc_id", "text", 3)
    time("verify")(verified.count())
    time("full_pipeline")(
      Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5).count())
    spark.stop()
  }
}
