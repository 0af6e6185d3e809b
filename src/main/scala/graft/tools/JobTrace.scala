package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct, xxhash64}

/** Optimization-round job attribution: runs one registry query with the
  * bench session and prints one line per Spark job with its call site —
  * which operator line fired each action. Fixed per-job overhead is the
  * dominant term on the sf0.1 board (~40-60 ms/job at local[32]), so the
  * per-query job census is the map of where that overhead comes from.
  *
  * Usage: SPARK_GRAFT_TRACE_ONLY=d13_incremental_near_dedup \
  *   sbt "runMain graft.tools.JobTrace"
  */
object JobTrace {

  private final class Tracer extends SparkListener {
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val site = Option(js.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      val stages = js.stageInfos.size
      val tasks = js.stageInfos.map(_.numTasks).sum
      println(f"job ${js.jobId}%3d  stages=$stages%2d tasks=$tasks%3d  $site")
    }
  }

  private def checksum(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
      .selectExpr("bit_xor(__h)")
      .collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_FALLBACK", "4096"))
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.queries.Registry.byName.get("q03_join_revenue_by_nation")
      .foreach(q => checksum(q.fn(spark, sfDir)))

    val only = sys.env.getOrElse("SPARK_GRAFT_TRACE_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    spark.sparkContext.addSparkListener(new Tracer)
    graft.SparkEntry.queries
      .filter(kv => only.contains(kv._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"=== $name")
        val t0 = System.nanoTime()
        checksum(fn(spark, sfDir))
        println(f"=== $name done in ${(System.nanoTime() - t0) / 1e9}%.3f s")
        Thread.sleep(100)
      }
    spark.stop()
  }
}
