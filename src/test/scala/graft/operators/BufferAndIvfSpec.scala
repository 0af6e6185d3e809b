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
}
