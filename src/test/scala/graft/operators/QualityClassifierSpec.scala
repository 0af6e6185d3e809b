package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // 60 clean prose docs + 60 junk docs (letter noise, no stopwords)
  private def corpus = {
    val rnd = new scala.util.Random(3)
    val clean = (0 until 60).map { i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog and " +
        s"this is a perfectly normal sentence number $i with the usual words", 1)
    }
    val junk = (60 until 120).map { i =>
      val s = (0 until 12)
        .map(_ => (0 until 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
        .mkString(" ")
      (i.toLong, s, 0)
    }
    (clean ++ junk).toDF("doc_id", "text", "label")
  }

  test("fit separates planted junk from prose: AUC > 0.9 via the rank-sum kernel") {
    val model = QualityClassifier.fit(corpus, "doc_id", "text", $"label",
      dim = 64, sampleN = 120, epochs = 300)
    val scored = corpus.select($"label",
      QualityClassifier.scoreColumn($"text", model).as("s"))
      .as[(Int, Double)].collect()
    scored.foreach { case (_, s) => assert(s >= 0.0 && s <= 1.0) }
    val sArr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      scored.map(_._2))
    val lArr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      scored.map(_._1))
    val auc = graft.plans.VecKernels.arrayAuc(sArr, lArr)
    assert(auc > 0.9, s"AUC $auc")
  }

  test("fit and scoring are deterministic and partition-invariant") {
    val m1 = QualityClassifier.fit(corpus, "doc_id", "text", $"label",
      dim = 32, sampleN = 80, epochs = 100)
    val m2 = QualityClassifier.fit(corpus.repartition(7), "doc_id", "text",
      $"label", dim = 32, sampleN = 80, epochs = 100)
    assert(m1.weights.toSeq == m2.weights.toSeq && m1.bias == m2.bias)
    val s1 = corpus.select($"doc_id",
      QualityClassifier.scoreColumn($"text", m1).as("s"))
      .as[(Long, Double)].collect().toMap
    val s2 = corpus.repartition(5).select($"doc_id",
      QualityClassifier.scoreColumn($"text", m1).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(s1 == s2)
  }

  test("driver-side scoring agrees with the distributed column (feature parity)") {
    val model = QualityClassifier.fit(corpus, "doc_id", "text", $"label",
      dim = 32, sampleN = 80, epochs = 100)
    val viaColumn = corpus.filter($"doc_id" === 0L)
      .select(QualityClassifier.scoreColumn($"text", model))
      .as[Double].head()
    val text = corpus.filter($"doc_id" === 0L).select($"text").as[String].head()
    val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim.split(" ").iterator
    assert(math.abs(model.score(toks) - viaColumn) < 1e-12)
  }
}
