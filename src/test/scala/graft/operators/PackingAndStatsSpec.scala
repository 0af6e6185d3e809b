package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence packing (two-phase prefix sum) + corpus TF-IDF stats. */
class PackingAndStatsSpec extends SparkSpec {
  import spark.implicits._

  test("concatChunk matches a sequential single-pass pack") {
    val docs = (1L to 200L).map(i => (i, (i * 37 % 90 + 1))).toDF("id", "tok")
    // force multiple partitions so the partition-offset phase is exercised
    val packed = Packing.concatChunk(docs, "id", "tok", budget = 100,
      targetPartitions = 7).orderBy("id").collect()
    var start = 0L
    docs.orderBy("id").collect().zip(packed).foreach { case (d, p) =>
      val tok = d.getLong(1)
      assert(p.getAs[Long]("seq_id") == start / 100, s"seq_id at id=${d.getLong(0)}")
      assert(p.getAs[Long]("seq_offset") == start % 100)
      assert(p.getAs[Long]("end_seq_id") == (start + math.max(tok, 1) - 1) / 100)
      start += tok
    }
  }

  test("concatChunk handles zero-token and over-budget docs") {
    val docs = Seq((1L, 0L), (2L, 250L), (3L, 50L)).toDF("id", "tok")
    val rows = Packing.concatChunk(docs, "id", "tok", budget = 100)
      .orderBy("id").collect()
    // doc1: start 0, zero tokens → occupies its start slot in seq 0
    assert(rows(0).getAs[Long]("seq_id") == 0 && rows(0).getAs[Long]("end_seq_id") == 0)
    // doc2: start 0..249 spans seqs 0-2
    assert(rows(1).getAs[Long]("seq_id") == 0 && rows(1).getAs[Long]("end_seq_id") == 2)
    // doc3: start 250 → seq 2 offset 50, ends at 299 in seq 2
    assert(rows(2).getAs[Long]("seq_id") == 2 && rows(2).getAs[Long]("seq_offset") == 50
      && rows(2).getAs[Long]("end_seq_id") == 2)
  }

  test("packedSlices reconstructs every doc and fills every sequence") {
    val docs = Seq((1L, 30L), (2L, 0L), (3L, 250L), (4L, 70L), (5L, 10L))
      .toDF("id", "tok")
    val slices = Packing.packedSlices(
      Packing.concatChunk(docs, "id", "tok", budget = 100), "id", 100)
    val rows = slices.collect()
    // per-doc: slice lengths sum to the doc's tokens, doc_offs contiguous
    val byDoc = rows.groupBy(_.getAs[Long]("id"))
    assert(!byDoc.contains(2L)) // zero-token doc emits no slice
    assert(byDoc(3L).map(_.getAs[Long]("len")).sum == 250L)
    byDoc.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_off"))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("doc_off") == expect)
        expect += r.getAs[Long]("len")
      }
    }
    // per-sequence: slices tile [0, fill) with no gaps or overlaps
    rows.groupBy(_.getAs[Long]("seq_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("seq_off"))
      var cursor = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("seq_off") == cursor)
        cursor += r.getAs[Long]("len")
      }
      assert(cursor <= 100L)
    }
    // total conservation
    assert(rows.map(_.getAs[Long]("len")).sum == 360L)
  }

  test("concatChunk tolerates null token counts (fold to zero)") {
    val docs = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "tok")
    val packed = Packing.concatChunk(docs, "id", "tok", budget = 10)
      .orderBy("id").collect()
    assert(packed.length == 3)
    assert(packed(1).getAs[Long]("n_tokens") == 0L)
    assert(packed(2).getAs[Long]("seq_offset") == 5L) // null contributed 0
  }

  test("sequenceFill conserves the total token count") {
    val docs = (1L to 50L).map(i => (i, i % 37 + 3)).toDF("id", "tok")
    val packed = Packing.concatChunk(docs, "id", "tok", budget = 64)
    val fill = Packing.sequenceFill(packed, budget = 64)
    val total = fill.agg(sum("fill_tokens")).as[Long].head()
    val expected = docs.agg(sum("tok")).as[Long].head()
    assert(total == expected)
    // every sequence but the last is exactly full
    val fills = fill.orderBy("seq_id").select("fill_tokens").as[Long].collect()
    assert(fills.init.forall(_ == 64L) && fills.last <= 64L)
  }

  test("concatChunk plans a partition-bounded window, not a global one") {
    val docs = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "tok")
    val plan = Packing.concatChunk(docs, "id", "tok", budget = 50)
      .queryExecution.executedPlan.toString
    // the only window is the within-partition running sum keyed on __pid —
    // an empty partition spec would funnel the corpus through one reducer
    assert(plan.contains("windowspecdefinition(__pid"), plan.take(2000))
    assert(!plan.contains("windowspecdefinition(id#") &&
      !"windowspecdefinition\\(\\s*id".r.findFirstIn(plan).isDefined)
  }

  test("connectedComponents labels chains and leaves separate components apart") {
    // chain 1-2-3-4, pair 10-11, singleton 20 not in pairs
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (11L, 10L)).toDF("a", "b")
    for (cc <- Seq(
        Dedup.connectedComponents(pairs),
        Dedup.connectedComponentsStars(pairs))) {
      val m = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(m(_) == 1L))
      assert(m(10L) == 10L && m(11L) == 10L)
    }
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val reps = Dedup.clusterRepresentatives(docs, "doc_id", pairs.toDF())
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cluster_id")).toMap
    assert(reps(20L) == 20L && reps(4L) == 1L && reps(11L) == 10L)
  }

  test("durable-checkpoint CC mode matches the default and writes reliable checkpoints") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck").toFile
    spark.sparkContext.setCheckpointDir(dir.toString)
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (11L, 10L), (7L, 4L)).toDF("a", "b")
    val base = Dedup.connectedComponentsStars(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durable = Dedup.connectedComponentsStars(pairs, reliableEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(durable == base)
    // round state actually landed on durable storage (the recovery anchor)
    def countFiles(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles.map(countFiles).sum else 1
    assert(countFiles(dir) > 0)
    val minLabel = Dedup.connectedComponents(pairs, reliableEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(minLabel == base)
  }

  test("star contraction agrees with union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // component min over the vertices actually present in edges
          val root = find(v.toInt)
          edges.flatMap(e => Seq(e._1, e._2)).distinct
            .filter(u => find(u.toInt) == root).min
        }).toMap
      // default path finishes locally once the contracted graph is small;
      // threshold 0 forces the pure-distributed fixed point — both must
      // agree with ground truth
      val got = Dedup.connectedComponentsStars(edges.toDF("a", "b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val distributed = Dedup.connectedComponentsStars(edges.toDF("a", "b"),
          localFinishThreshold = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == truth, s"trial $trial")
      assert(distributed == truth, s"trial $trial (distributed)")
    }
  }

  test("tfidf: counts exact, weight matches the definition") {
    val docs = Seq(
      (1L, Seq("a", "b", "a")),
      (2L, Seq("b", "c")),
      (3L, Seq("c", "c", "c", "d"))).toDF("id", "toks")
    val out = CorpusStats.tfidf(docs, "id", col("toks"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("term")) -> r).toMap
    val r1a = out((1L, "a"))
    assert(r1a.getAs[Long]("tf_count") == 2 && r1a.getAs[Long]("doc_len") == 3
      && r1a.getAs[Long]("df") == 1 && r1a.getAs[Long]("n_docs") == 3)
    assert(math.abs(r1a.getAs[Double]("tfidf") - (2.0 / 3.0) * math.log(3.0)) < 1e-12)
    val r2b = out((2L, "b"))
    assert(r2b.getAs[Long]("df") == 2)
    assert(math.abs(r2b.getAs[Double]("tfidf") - 0.5 * math.log(1.5)) < 1e-12)
  }

  test("vocabulary: df/cf/idf per term") {
    val docs = Seq((1L, Seq("x", "x", "y")), (2L, Seq("y", "z"))).toDF("id", "toks")
    val v = CorpusStats.vocabulary(docs, "id", col("toks"))
      .collect().map(r => r.getAs[String]("term") -> r).toMap
    assert(v("x").getAs[Long]("df") == 1 && v("x").getAs[Long]("cf") == 2)
    assert(v("y").getAs[Long]("df") == 2 && v("y").getAs[Long]("cf") == 2)
    assert(math.abs(v("z").getAs[Double]("idf") - math.log(2.0)) < 1e-12)
  }

  test("perplexityScore ranks planted junk above normal text") {
    val normal = (1L to 40L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog number $i and then " +
        "walks back home through the quiet evening streets"))
    val junk = Seq(
      (100L, "qzxj wvkq pzzt xqzv jjqk zzxw qvjp kxzq wqzz jxvk qpzt zvxq"),
      (101L, "zz"))  // < 3 normalized chars -> excluded entirely
    val scored = CorpusStats.perplexityScore(
      (normal ++ junk).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!scored.contains(101L))
    val junkNll = scored(100L)
    val normalMax = normal.map(_._1).map(scored).max
    assert(junkNll > normalMax,
      s"junk nll $junkNll must exceed every normal doc (max $normalMax)")
  }

  test("chunkByTokens: coverage, overlap, reconstruction, edge cases") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 toks -> 3 chunks
      (2L, (1 to 48).map(i => s"x$i").mkString(" ")),  // exactly max -> 1
      (3L, (1 to 49).map(i => s"y$i").mkString(" ")),  // 1 over -> 2
      (4L, "  a \n b\tc  "),                           // whitespace mess -> 1
      (5L, "   ")                                      // no tokens -> 0 chunks
    ).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(docs, "doc_id", "text", 48, 8)
      .orderBy($"doc_id", $"chunk_id")
      .as[(Long, Int, Int, Int, String)].collect()

    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).length == 3 && byDoc(2L).length == 1 && byDoc(3L).length == 2)
    assert(!byDoc.contains(5L))
    assert(byDoc(4L).head._5 == "a b c")
    // starts advance by stride=40; consecutive chunks share 8 tokens
    assert(byDoc(1L).map(_._3).toSeq == Seq(0, 40, 80))
    val c0 = byDoc(1L)(0)._5.split(" ")
    val c1 = byDoc(1L)(1)._5.split(" ")
    assert(c0.takeRight(8).toSeq == c1.take(8).toSeq)
    // every token position is covered and lengths add up
    assert(byDoc(1L).map(_._4).toSeq == Seq(48, 48, 20))
    assert(byDoc(3L).map(_._4).toSeq == Seq(48, 9))
    // dropping each chunk's leading overlap (after the first) rebuilds the doc
    val rebuilt = byDoc(1L).sortBy(_._2).zipWithIndex.flatMap { case (c, i) =>
      val ts = c._5.split(" ").toSeq
      if (i == 0) ts else ts.drop(8)
    }
    assert(rebuilt.toSeq == (1 to 100).map(i => s"w$i"))
  }
}
