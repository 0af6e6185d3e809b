package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "low low low low low"),
    (1L, "lower lower newer newer newer newer"),
    (2L, "newest widest")
  ).toDF("doc_id", "text")

  test("fit learns the classic frequency-ordered merges deterministically") {
    val merges = BpeTokenizer.fit(corpus, "doc_id", "text", numMerges = 4,
      sampleN = 100)
    // pair counts over the corpus: (l,o) 7, (o,w) 7, (e,r) 6, (n,e) 5(+4 in
    // newer's "ne") ... the first merge must be a 7-count pair; ties break
    // lexicographically → (l,o) before (o,w)
    assert(merges.head == (("l", "o")), s"got $merges")
    assert(merges(1) == (("lo", "w")), s"got $merges")
    // re-fit is identical (hash-ordered sample, deterministic ties)
    val again = BpeTokenizer.fit(corpus.repartition(3), "doc_id", "text",
      numMerges = 4, sampleN = 100)
    assert(again == merges)
  }

  test("encode applies merges by rank and decode is concatenation") {
    val merges = BpeTokenizer.fit(corpus, "doc_id", "text", numMerges = 10,
      sampleN = 100)
    val ranks = merges.zipWithIndex.toMap
    for (w <- Seq("low", "lower", "newest", "unseenword", "x")) {
      val toks = BpeTokenizer.encodeWord(w, ranks)
      assert(toks.mkString == w, s"decode identity broken for $w: $toks")
    }
    // a fully-merged frequent word collapses to one token
    assert(BpeTokenizer.encodeWord("low", ranks) == Seq("low"))
  }

  test("encodeStats: subword count between word count and char count; distributed determinism") {
    val merges = BpeTokenizer.fit(corpus, "doc_id", "text", numMerges = 6,
      sampleN = 100)
    val a = BpeTokenizer.encodeStats(corpus, "doc_id", "text", merges)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    val b = BpeTokenizer.encodeStats(corpus.repartition(5), "doc_id", "text",
      merges).orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    a.foreach { case (_, nWords, nBpe) =>
      assert(nBpe >= nWords, s"fewer subwords than words: $a")
    }
    // doc 0: "low" merged to a single token → n_bpe == n_words
    assert(a.head._3 == a.head._2)
  }
}
