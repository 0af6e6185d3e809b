package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sfDir).embeddings

  test("bruteForceTopK returns k ordered neighbors per query") {
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val res = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "query_id", "qv", k = 5).cache()
    assert(res.groupBy("query_id").count().select("count").as[Long].collect().forall(_ == 5))
    // scores are non-increasing with rank
    val perQ = res.orderBy($"query_id", $"rank")
      .select($"query_id", $"cosine").as[(Long, Double)].collect().groupBy(_._1)
    perQ.values.foreach { xs =>
      val cs = xs.map(_._2)
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("LSH ANN recovers planted near-duplicates") {
    // LSH blocking is for NEAR vectors (near-dup retrieval); on uniformly
    // random vectors every method degrades to scanning. Plant twins:
    // corpus = twin(center)+noise ∪ decoys; query = centers. The twin must
    // come back as the top-1 neighbor for most queries.
    val rnd = new scala.util.Random(7)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val dim = 64
    val centers = (0 until 20).map(i => (i.toLong, unit(dim)))
    val twins = centers.map { case (i, c) =>
      (1000L + i, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    val decoys = (0 until 200).map(i => (2000L + i, unit(dim)))
    val corpus = (twins ++ decoys).toDF("vec_id", "embedding")
    val queries = centers.toDF("query_id", "qv")
    val top1 = SimilaritySearch.lshTopK(corpus, "vec_id", "embedding",
        queries, "query_id", "qv", k = 1, bits = 12)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toMap
    val hits = centers.count { case (i, _) => top1.get(i).contains(1000L + i) }
    assert(hits >= 16, s"recovered $hits/20 planted twins")
  }

  test("PQ ADC score equals exact cosine against the reconstructed code") {
    val cb = SimilaritySearch.pqFit(emb, "embedding", m = 8, ksub = 16)
    // decode each corpus row's code and check the ADC score is the exact
    // cosine(query, reconstruction) — ADC's only approximation is the
    // quantization itself, never the scoring arithmetic
    val q = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val got = SimilaritySearch.pqTopK(emb, "vec_id", "embedding",
        q, "query_id", "qv", k = 3, m = 8, ksub = 16)
      .select($"vec_id", $"cosine").as[(Long, Double)].collect().toMap
    val qVec = emb.filter($"vec_id" === 0)
      .select($"embedding").as[Array[Float]].head()
    val subDim = cb.subDim
    def decode(v: Array[Float]): Array[Float] = {
      val rec = new Array[Float](cb.m * subDim)
      for (j <- 0 until cb.m) {
        // nearest centroid per subspace (same metric as the encoder)
        val best = (0 until cb.ksub).minBy { c =>
          val base = (j * cb.ksub + c) * subDim
          (0 until subDim).map { t =>
            val d = v(j * subDim + t) - cb.flat(base + t); d * d
          }.sum
        }
        System.arraycopy(cb.flat, (j * cb.ksub + best) * subDim, rec,
          j * subDim, subDim)
      }
      rec
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    got.foreach { case (id, adc) =>
      val expected = cos(qVec, decode(vecs(id)))
      assert(math.abs(adc - expected) < 1e-5,
        s"vec $id: adc=$adc exact=$expected")
    }
  }

  test("PQ and IVF-PQ ANN recover planted near-duplicates") {
    val rnd = new scala.util.Random(11)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val dim = 64
    val centers = (0 until 20).map(i => (i.toLong, unit(dim)))
    val twins = centers.map { case (i, c) =>
      (1000L + i, c.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val decoys = (0 until 300).map(i => (2000L + i, unit(dim)))
    val corpus = (twins ++ decoys).toDF("vec_id", "embedding")
    val queries = centers.toDF("query_id", "qv")
    def hits(res: org.apache.spark.sql.DataFrame): Int = {
      val topK = res.select($"query_id", $"vec_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      centers.count { case (i, _) => topK.get(i).exists(_.contains(1000L + i)) }
    }
    val pq = SimilaritySearch.pqTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qv", k = 3, m = 8, ksub = 16)
    assert(hits(pq) >= 18, s"PQ recovered ${hits(pq)}/20 planted twins")
    val ivfpq = SimilaritySearch.ivfPqTopK(corpus, "vec_id", "embedding",
      queries, "query_id", "qv", k = 3, nLists = 8, nProbe = 3,
      m = 8, ksub = 16)
    assert(hits(ivfpq) >= 15, s"IVF-PQ recovered ${hits(ivfpq)}/20 planted twins")
  }

  test("cosine expression matches a scala-side computation") {
    val rows = emb.limit(2).select($"embedding").as[Array[Float]].collect()
    val expected = {
      val (a, b) = (rows(0), rows(1))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val got = emb.limit(2).agg(collect_list($"embedding").as("vs"))
      .select(SimilaritySearch.cosine(element_at($"vs", 1), element_at($"vs", 2)))
      .as[Double].head()
    assert(math.abs(got - expected) < 1e-9)
  }

  test("embeddingClusters recovers well-separated planted clusters with purity 1.0") {
    // 3 orthogonal-ish directions, 40 vectors each with small jitter
    val rnd = new scala.util.Random(9)
    val bases = Seq(
      Array(10f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f), Array(0f, 0f, 10f, 0f))
    val rows = for (b <- bases.indices; i <- 0 until 40) yield {
      val v = bases(b).map(x => x + rnd.nextFloat() * 0.5f)
      (b.toLong * 40 + i, v.toSeq, b)
    }
    val df = rows.toDF("vec_id", "embedding", "truth")
      .select($"vec_id", $"embedding".cast("array<float>"), $"truth")
    val out = SimilaritySearch.embeddingClusters(df, "vec_id", "embedding",
        k = 3, maxTrain = 1000)
      .select($"truth", $"cluster", $"cos_to_center")
      .as[(Int, Int, Double)].collect()
    // every truth group maps to exactly one cluster id (purity 1.0)
    val mapping = out.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(mapping.values.forall(_.length == 1), s"split clusters: $mapping")
    assert(mapping.values.flatten.toSet.size == 3, s"merged clusters: $mapping")
    out.foreach { case (_, _, c) => assert(c > 0.99, s"weak assignment $c") }
    // determinism across partitioning
    val again = SimilaritySearch.embeddingClusters(df.repartition(7),
        "vec_id", "embedding", k = 3, maxTrain = 1000)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    val firstMap = SimilaritySearch.embeddingClusters(df, "vec_id",
        "embedding", k = 3, maxTrain = 1000)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    assert(again == firstMap)
  }

  test("assignToCentroids: argmax by cosine, 1-based cluster ids, " +
    "lower-index tie-break") {
    val df = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>"))
    val centers = Array(Array(1f, 0f), Array(0f, 1f))
    val out = SimilaritySearch.assignToCentroids(df, "embedding", centers)
      .select($"vec_id", $"cluster", $"cos_to_center")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(out.map(r => r._1 -> r._2).toSeq == Seq(1L -> 1, 2L -> 2, 3L -> 1))
    assert(math.abs(out(0)._3 - 1.0) < 1e-12)
    // exact tie (45°) keeps the LOWER centroid index — the stable sort
    val tied = Seq((9L, Seq(1f, 1f))).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>"))
    val t = SimilaritySearch.assignToCentroids(tied, "embedding", centers)
      .select($"cluster").as[Int].head()
    assert(t == 1)
  }

  test("ivfTopKWithCenters with nProbe = nLists equals bruteForceTopK") {
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val centers = emb.filter($"vec_id" < 8).orderBy($"vec_id")
      .select($"embedding").as[Array[Float]].collect()
    val ivf = SimilaritySearch.ivfTopKWithCenters(emb, "vec_id", "embedding",
        queries, "query_id", "qv", k = 5, centers, nProbe = centers.length)
      .select($"query_id", $"rank", $"vec_id")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    val brute = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "query_id", "qv", k = 5)
      .select($"query_id", $"rank", $"vec_id")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(ivf.toSeq == brute.toSeq)
  }
}
