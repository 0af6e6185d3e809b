package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, xxhash64}

/** Per-round benchmark: runs every registry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * Queries run in name order after a small warm-up action (JIT/codegen
  * warm-up would otherwise be billed to whichever query runs first).
  *
  * The timed action is a checksum over EVERY column (xxhash64 of the row
  * struct, xor-folded), not `count()`: count lets Catalyst prune whole
  * projections on scan-shaped queries, which would understate real
  * materialization cost.
  *
  * Timing protocol — medians ACROSS whole-board passes: the board runs
  * end-to-end N times (default 3) and each query's number is the median
  * of its per-pass timings. Back-to-back reps of one query share a JVM
  * "mode" (JIT/codegen epoch state), so a per-query rep loop produced
  * tight-but-wrong numbers — 6 queries disagreed up to 6.6x between two
  * runs of identical code while each run's own spread looked clean.
  * Separating a query's samples by a full board pass decorrelates them
  * from the moment's JIT state. Per-query GC seconds and the process's
  * JIT compilation time ride along in the artifact so a stall's source
  * is attributable, and build.sbt pins -XX:ReservedCodeCacheSize=1g:
  * with the JVM default 240m, ~170 codegen-heavy plans can fill the
  * code cache mid-board, silently disabling the JIT compiler — the
  * mechanism behind the "tightly slow" mode on late (t-prefixed)
  * queries.
  */
object Bench {

  private def checksum(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
      .selectExpr("bit_xor(__h)")
      .collect()
    ()
  }

  /** Total stop-the-world GC milliseconds accumulated by the JVM. */
  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // static conf, must precede session creation: the default codegen
      // class cache (100 entries) cannot hold one board pass (~170
      // queries x several codegen stages), so every pass re-compiled
      // and re-JITted every plan — pure fixed overhead billed to every
      // query's number. Sized to hold the whole board hot.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: a scan+agg+join exercising codegen, shuffle and parquet IO
    graft.queries.Registry.byName.get("q03_join_revenue_by_nation")
      .foreach(q => checksum(q.fn(spark, sfDir)))

    // dev loop: SPARK_GRAFT_BENCH_ONLY=q01,t23 restricts the timed set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val picked = only.fold(SparkEntry.queries)(w =>
      SparkEntry.queries.filter(kv => w(kv._1)))
    // Between-query hygiene: a handful of operators localCheckpoint or
    // persist intermediate state (packing, iterative dedup, IVF build).
    // Left in place across 149 queries those blocks squat in storage
    // memory and skew LATER queries' timings (observed 10x on unrelated
    // queries). Each registry entry is self-contained, so dropping all
    // persisted state after a query finishes is safe and makes every
    // timing a clean-session measurement.
    def resetState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // time + GC seconds attributable to the one query's run
    def timeOne(name: String, fn: (SparkSession, String) => DataFrame)
        : (Double, Double) = {
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      try { checksum(fn(spark, sfDir)) }
      catch { case t: Throwable => failed += name; t.printStackTrace() }
      val dt = (System.nanoTime() - t0) / 1e9
      val gcDt = (gcMillis - gc0) / 1e3
      resetState()
      (dt, gcDt)
    }
    // Locale-pinned formatting: the default locale may use a comma
    // decimal separator, which would corrupt the JSON line.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val passes = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_RUNS").flatMap(_.toIntOption).getOrElse(3))
    // System load average at start and end: a board run that overlaps
    // another heavyweight process (a concurrent sbt/Spark JVM) shifts
    // EVERY query by the same ~1.5-2x factor — recording the 1-minute
    // load makes a contaminated artifact self-evident instead of
    // masquerading as a per-query regression.
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadAvg
    val names = picked.toSeq.sortBy(_._1)
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val gcs = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to passes).foreach { pass =>
      names.foreach { case (name, fn) =>
        val (dt, gcDt) = timeOne(name, fn)
        times(name) = times(name) :+ dt
        gcs(name) = gcs(name) :+ gcDt
        // One `pass,name,sec,gcsec` line per completed run: any bounded
        // tail of the process output keeps per-query data even when the
        // final JSON line is longer than the tail window.
        println(s"p$pass,$name,${fmt(dt)},${fmt(gcDt)}")
      }
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    val results = names.map { case (name, _) =>
      val ts = times(name).sorted
      (name, median(ts), ts.head, ts.last, median(gcs(name)))
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, _, lo, hi, _) => "\"" + k + "\":[" + fmt(lo) + "," + fmt(hi) + "]" }
      .mkString("{", ",", "}")
    val gcJson = results.map { case (k, _, _, _, g) => "\"" + k + "\":" + fmt(g) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // process-level JIT evidence: total compilation ms and code-cache
    // occupancy at end of board — if the cache ever filled, the JIT was
    // silently off for part of the run and the numbers are mode-tainted
    val jitMs = java.lang.management.ManagementFactory
      .getCompilationMXBean match {
        case b if b != null && b.isCompilationTimeMonitoringSupported =>
          b.getTotalCompilationTime
        case _ => -1L
      }
    val codeCacheUsed = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(_.getUsage.getUsed).sum / (1024 * 1024)
    }
    val errs =
      if (failed.isEmpty) ""
      else failed.distinct.map("\"" + _ + "\"").mkString(""","errors":[""", ",", "]")
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","passes":$passes,"queries":$qs,"spread":$spread,"gc":$gcJson,"jit_ms":$jitMs,"code_cache_mb":$codeCacheUsed,"load_avg":[${fmt(loadStart)},${fmt(loadAvg)}]$errs,"sf":"$sfDir"}"""
    // Lossless artifact: the full JSON is also written to a file so the
    // round comparison never depends on stdout-capture windows.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_local.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException => System.err.println(s"bench: could not write $outFile: $e") }
    println(json)
    spark.stop()
  }
}
