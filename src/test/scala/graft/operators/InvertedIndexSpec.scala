package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the cat sat"),
    (1L, "the dog sat sat"), // duplicate term collapses for df
    (2L, "a cat ran"),
    (65536L, "the cat returned")
  ).toDF("doc_id", "text")

  test("build collapses duplicate terms, sorts postings, applies minDf") {
    val idx = InvertedIndex.build(docs, $"doc_id", split($"text", " "))
      .as[(String, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(idx("sat") == ((0L, 2L, Seq(0L, 1L))))
    assert(idx("cat") == ((0L, 3L, Seq(0L, 2L, 65536L))))
    assert(idx("the")._2 == 3L)
    val trimmed = InvertedIndex.build(docs, $"doc_id", split($"text", " "),
      minDfShard = 2L).select($"term").as[String].collect().toSet
    assert(trimmed == Set("the", "cat", "sat"))
  }

  test("sharded layout splits postings by doc-id range and bounds row growth") {
    // shardBits=16: doc 65536 lands in shard 1, everything else shard 0
    val idx = InvertedIndex.build(docs, $"doc_id", split($"text", " "),
        shardBits = 16)
      .as[(String, Long, Long, Seq[Long])].collect()
    val cat = idx.filter(_._1 == "cat").sortBy(_._2)
    assert(cat.map(r => (r._2, r._4)).toSeq ==
      Seq((0L, Seq(0L, 2L)), (1L, Seq(65536L))))
    // partition-invariance of the whole index
    val a = InvertedIndex.build(docs.repartition(5), $"doc_id",
      split($"text", " "), shardBits = 16)
      .as[(String, Long, Long, Seq[Long])].collect().toSet
    assert(a == idx.toSet)
  }

  test("lookup prunes by broadcast term set and explodes postings") {
    val idx = InvertedIndex.build(docs, $"doc_id", split($"text", " "))
    val hits = InvertedIndex.lookup(idx, Seq("cat", "ran"))
      .as[(String, Long)].collect().toSet
    assert(hits == Set(("cat", 0L), ("cat", 2L), ("cat", 65536L), ("ran", 2L)))
  }
}
