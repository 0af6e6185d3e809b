package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BufferAndIvfSpec extends SparkSpec {
  import spark.implicits._

  test("BufferEngine: thresholds flush, reads see buffered rows") {
    val dir = Files.createTempDirectory("graft_buffer").toString + "/t"
    var now = 0L
    val buf = new BufferEngine(spark, dir, maxRows = 5, maxAgeMs = 1000,
      clock = () => now)
    buf.insert(Seq((1, "a"), (2, "b")).toDF("k", "s"))
    assert(buf.bufferedRows == 2)
    assert(buf.read().count() == 2)               // read sees the buffer
    assert(!new java.io.File(dir).exists())       // nothing flushed yet
    buf.insert(Seq((3, "c"), (4, "d"), (5, "e")).toDF("k", "s"))
    assert(buf.bufferedRows == 0)                 // row threshold flushed
    assert(spark.read.parquet(dir).count() == 5)
    // age-based flush
    buf.insert(Seq((6, "f")).toDF("k", "s"))
    assert(buf.bufferedRows == 1)
    now = 2000L
    buf.insert(Seq((7, "g")).toDF("k", "s"))
    assert(buf.bufferedRows == 0)                 // age threshold flushed
    assert(spark.read.parquet(dir).count() == 7)
    assert(buf.read().count() == 7)
  }

  test("IVF ANN recovers planted near-duplicates via cell probing") {
    val rnd = new scala.util.Random(11)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val centersV = (0 until 15).map(i => (i.toLong, unit(32)))
    val twins = centersV.map { case (i, c) =>
      (1000L + i, c.map(x => x + 0.03f * rnd.nextGaussian().toFloat))
    }
    val decoys = (0 until 150).map(i => (2000L + i, unit(32)))
    val corpus = (twins ++ decoys).toDF("vec_id", "embedding")
    val queries = centersV.toDF("query_id", "qv")
    val top1 = SimilaritySearch.ivfTopK(corpus, "vec_id", "embedding",
        queries, "query_id", "qv", k = 1, nLists = 8, nProbe = 3)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toMap
    val hits = centersV.count { case (i, _) => top1.get(i).contains(1000L + i) }
    assert(hits >= 12, s"recovered $hits/15 planted twins")
  }

  test("d10 registry query prunes cell partitions and ranks real neighbors") {
    val res = graft.queries.Registry.byName("d10_ann_ivf").fn(spark, sfDir)
    val rows = res.collect()
    assert(rows.length == 50, s"expected 5 queries x k=10, got ${rows.length}")
    // ranks are 1..10 per query, cosines non-increasing within a query
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 10))
      val cos = sorted.map(_.getDouble(3)).toSeq
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // the probe's cell filter reached the scan as a partition filter
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(2000))
  }

  test("persisted IVF: probe prunes cell partitions at the scan") {
    val rnd = new scala.util.Random(23)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val centersV = (0 until 12).map(i => (i.toLong, unit(32)))
    val twins = centersV.map { case (i, c) =>
      (1000L + i, c.map(x => x + 0.03f * rnd.nextGaussian().toFloat))
    }
    val decoys = (0 until 150).map(i => (2000L + i, unit(32)))
    val corpus = (twins ++ decoys).toDF("vec_id", "embedding")
    val queries = centersV.take(2).toDF("query_id", "qv")

    val path = Files.createTempDirectory("graft_ivf").toString
    SimilaritySearch.ivfWrite(corpus, "vec_id", "embedding", path, nLists = 8)
    // index layout: one directory per cell
    val cellDirs = new java.io.File(path + "/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 1, "expected multiple cell partitions")

    val res = SimilaritySearch.ivfProbe(spark, path,
      queries, "query_id", "qv", k = 1, nProbe = 2)
    // the probe's cell filter must reach the scan as a partition filter
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(2000))

    val top1 = res.select($"query_id", $"vec_id").as[(Long, Long)].collect().toMap

    // with 2 queries × 2 probes ≤ 4 of 8 cells are scanned: the scan's
    // numFiles metric (post-pruning) must be below the full file count
    // (DataFrame.inputFiles does NOT apply partition pruning, so compare
    // the executed scan's metric instead)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other                    => other.children.flatMap(scans)
    }
    val ivfScan = scans(res.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("data")))
    assert(ivfScan.nonEmpty, "expected a FileSourceScan over the ivf data")
    val filesRead = ivfScan.map(_.metrics("numFiles").value).sum
    val filesTotal = spark.read.parquet(path + "/data").inputFiles.length
    assert(filesRead < filesTotal,
      s"probe read $filesRead of $filesTotal files — no pruning")
    val hits = centersV.take(2).count { case (i, _) => top1.get(i).contains(1000L + i) }
    assert(hits >= 1, s"recovered $hits/2 planted twins via persisted probe")
  }
}
