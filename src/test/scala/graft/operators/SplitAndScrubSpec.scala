package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class SplitAndScrubSpec extends SparkSpec {
  import spark.implicits._

  test("hash split: deterministic, append-stable, boundaries respected") {
    val weights = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val full = DatasetSplit.withSplit(
      spark.range(10000).toDF("id"), col("id"), weights, salt = "s1")
    // every bucket in range, label follows boundary exactly
    assert(full.filter(col("bucket") < 0 || col("bucket") >= 10000).count() == 0)
    assert(full.filter(
      (col("bucket") < 9000 && col("split") =!= "train") ||
      (col("bucket") >= 9000 && col("bucket") < 9500 && col("split") =!= "val") ||
      (col("bucket") >= 9500 && col("split") =!= "test")).count() == 0)
    // fractions land near the weights (md5 uniformity; wide tolerance)
    val n = full.filter(col("split") === "train").count()
    assert(n > 8700 && n < 9300, s"train=$n of 10000")
    // append-stability: the same key gets the same assignment regardless
    // of what else is in the frame
    val sub = DatasetSplit.withSplit(
      spark.range(100).toDF("id"), col("id"), weights, salt = "s1")
    val joined = sub.as("a").join(full.as("b"), "id")
      .filter(col("a.split") =!= col("b.split"))
    assert(joined.count() == 0)
    // a different salt draws a genuinely different split
    val other = DatasetSplit.withSplit(
      spark.range(10000).toDF("id"), col("id"), weights, salt = "s2")
    assert(full.as("a").join(other.as("b"), "id")
      .filter(col("a.split") =!= col("b.split")).count() > 0)
    // invalid weights rejected
    intercept[IllegalArgumentException] {
      DatasetSplit.withSplit(spark.range(1).toDF("id"), col("id"),
        Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("PII scrub: redacts email/ip/phone; ordering avoids cross-matches") {
    val t = Seq(
      "mail bob.smith+x@corp.example.org now",
      "server at 192.168.254.3 port 80",
      "call 555-0142 today",
      "all three a@b.co 10.0.0.1 555 9999",
      "clean text with numbers 12345").toDF("t")
      .select(TextFunctions.scrubPii($"t").as("s")).as[String].collect().toSeq
    assert(t == Seq(
      "mail [EMAIL] now",
      "server at [IP] port 80",
      "call [PHONE] today",
      "all three [EMAIL] [IP] [PHONE]",
      "clean text with numbers 12345"), t)
    // not an IP (only 3 parts) — but "333 4444" is phone-shaped, and the
    // dot before it is a word boundary, so the phone pass fires
    val ip = Seq("x 1.2.333 4444 y").toDF("t")
      .select(TextFunctions.scrubPii($"t").as("s")).as[String].head()
    assert(ip == "x 1.2.[PHONE] y", ip)
  }

  test("blocklist: whole-token hits only, distinct-counted") {
    val hits = Seq(
      ("the grass is green", 0L),     // "ass" must NOT fire inside "grass"
      ("ass", 1L),
      ("spam spam spam", 1L),         // distinct terms, not occurrences
      ("spam and ass", 2L),
      ("", 0L)).toDF("t", "want")
      .select(TextFunctions.blocklistHits($"t", Seq("ass", "spam"))
        .cast("long").as("got"), $"want")
    assert(hits.filter($"got" =!= $"want").count() == 0)
  }

  test("duplicate n-gram fraction: repeats score, short docs are 0") {
    val r = Seq("a b a b a", "x y z", "one", "")
      .toDF("t")
      .select(TextFunctions.duplicateNgramFraction($"t", 2).as("d"))
      .as[Double].collect().toSeq
    // "a b a b a": 2-grams [a b, b a, a b, b a] → 1 - 2/4 = 0.5
    assert(r == Seq(0.5, 0.0, 0.0, 0.0), r)
  }

  test("mixByWeight: integer epochs exact, fractional epoch near its rate, zero drops") {
    val df = spark.range(4000).toDF("id")
      .withColumn("src",
        when(col("id") % 4 === 0, "up")      // weight 2.5
          .when(col("id") % 4 === 1, "down") // weight 0.25
          .when(col("id") % 4 === 2, "gone") // weight 0
          .otherwise("flat"))                // default 1.0
    val out = DatasetMix.mixBySourceWeights(df, "src", col("id"),
      Map("up" -> 2.5, "down" -> 0.25, "gone" -> 0.0), 1.0, salt = "t")
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc.getOrElse("gone", 0L) == 0L)
    assert(bySrc("flat") == 1000L)
    // 1000 keys * 2.5 ≈ 2500; * 0.25 ≈ 250 (md5 uniformity, wide tolerance)
    assert(bySrc("up") > 2350 && bySrc("up") < 2650, bySrc)
    assert(bySrc("down") > 175 && bySrc("down") < 325, bySrc)
    // every full epoch present for every up-key
    assert(out.filter(col("src") === "up" && col("epoch") < 2).count() == 2000)
    // deterministic: same salt -> identical multiset
    val again = DatasetMix.mixBySourceWeights(df, "src", col("id"),
      Map("up" -> 2.5, "down" -> 0.25, "gone" -> 0.0), 1.0, salt = "t")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("deterministicShuffle: positions are a permutation, stable, and partitioning-independent") {
    val df = spark.range(5000).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame) =
      DatasetMix.deterministicShuffle(d, col("id"), salt = "e0")
        .select(col("id"), col("shuffle_pos"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(df.repartition(17))
    val b = run(df.coalesce(1))
    assert(a == b)
    // a permutation of 0..n-1, and not the identity order
    assert(a.map(_._2).sorted == (0L until 5000L))
    assert(a.count { case (id, pos) => id == pos } < 50)
    // a different salt draws a different permutation
    val c = DatasetMix.deterministicShuffle(df, col("id"), salt = "e1")
      .select(col("id"), col("shuffle_pos")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(c != a)
  }
}
