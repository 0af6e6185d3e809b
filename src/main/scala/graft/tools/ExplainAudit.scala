package graft.tools

import graft.GraftSession
import graft.queries.Registry

/** Dev tool: dump formatted physical plans for named queries (or a
  * default audit set) to check pushdown / broadcast / codegen shape.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_filter_pushdown",
        "q03_join_revenue_by_nation", "q07_asof_join", "q07b_asof_native",
        "d04_dedup_minhash", "d07_ann_brute_force", "d10_ann_ivf",
        "q52_sessionize", "d09_dedup_clusters", "t06_seq_pack",
        "t19_quota_sample", "t22_chunk_overlap", "t23_perplexity",
        "t15_dup_spans", "t24_weighted_sample", "t25_inverted_index",
        "q72_bitmap_overlap", "t26_hashing_tf")
    val spark = GraftSession.create(master = "local[4]")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
