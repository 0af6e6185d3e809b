package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks of the fused text kernels (winnowFp, gramMd5,
  * hashingTf, normText token offsets) against naive reference
  * implementations built from the published definitions — the same
  * regex/substr/md5 formulations the kernels replaced. No Spark session:
  * kernels are plain JVM methods, so hundreds of random documents
  * (unicode junk, repeated separators, empty/short inputs) run in
  * milliseconds.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def refNorm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString

  private def refGrams(s: String, k: Int): Seq[String] = {
    val toks = { val n = refNorm(s); if (n.isEmpty) Seq.empty else n.split(" ").toSeq }
    if (toks.length < k) Seq.empty
    else (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" "))
  }

  private def refWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    val hs = refGrams(s, k)
      .map(g => java.lang.Long.parseLong(md5Hex(g).take(8), 16))
    if (hs.isEmpty) Seq.empty
    else if (hs.length < w) Seq(hs.min)
    else hs.sliding(w).map(_.min).toSeq.distinct.sorted
  }

  private def randDoc(rnd: scala.util.Random): String = {
    val pieces = Seq("the", "cat", "sat", "älpha", "Beta-9", "x", "", "丁",
      "Q_Q", "42", "  ", "dog!", "éé", "newer", "low")
    (0 until rnd.nextInt(30))
      .map(_ => pieces(rnd.nextInt(pieces.length)))
      .mkString(Seq(" ", "  ", ",", ".").apply(rnd.nextInt(4)))
  }

  test("winnowFp matches the regex/substr/md5/sliding-min reference on 300 random docs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val doc = randDoc(rnd)
      val k = 1 + rnd.nextInt(4)
      val w = 1 + rnd.nextInt(5)
      val got = VecKernels.winnowFp(UTF8String.fromString(doc), k, w)
        .toLongArray().toSeq
      val want = refWinnow(doc, k, w)
      assert(got == want, s"doc='$doc' k=$k w=$w")
    }
  }

  test("gramMd5 matches md5-hex of every joined k-gram on 300 random docs") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val doc = randDoc(rnd)
      val k = 1 + rnd.nextInt(5)
      val got = VecKernels.gramMd5(UTF8String.fromString(doc), k)
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      val want = refGrams(doc, k).map(md5Hex)
      assert(gotSeq == want, s"doc='$doc' k=$k")
    }
  }

  test("hashingTf matches per-token md5-prefix bucketing on 200 random token arrays") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 200) {
      val toks = (0 until rnd.nextInt(40)).map(_ => s"t${rnd.nextInt(30)}")
      val dim = 1 + rnd.nextInt(64)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val got = VecKernels.hashingTf(arr, dim).toLongArray().toSeq
      val want = Array.fill(dim)(0L)
      toks.foreach { t =>
        val b = (java.lang.Long.parseLong(md5Hex(t).take(8), 16) % dim).toInt
        want(b) += 1
      }
      assert(got == want.toSeq, s"toks=$toks dim=$dim")
    }
  }

  test("arrayAuc matches the O(P*N) pairwise definition on 200 random score sets") {
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 200) {
      val n = 2 + rnd.nextInt(20)
      // coarse scores force ties through the average-rank path
      val scores = Seq.fill(n)((rnd.nextInt(6) / 5.0))
      val labels = Seq.fill(n)(rnd.nextInt(2))
      val sArr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        scores.toArray)
      val lArr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        labels.toArray)
      val got = VecKernels.arrayAuc(sArr, lArr)
      val pos = scores.zip(labels).filter(_._2 == 1).map(_._1)
      val neg = scores.zip(labels).filter(_._2 == 0).map(_._1)
      if (pos.isEmpty || neg.isEmpty) assert(got.isNaN)
      else {
        // AUC == P(pos > neg) + 0.5 P(pos == neg) over all pairs
        val wins = (for (p <- pos; q <- neg)
          yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        val want = wins / (pos.length * neg.length)
        assert(math.abs(got - want) < 1e-12,
          s"scores=$scores labels=$labels got=$got want=$want")
      }
    }
  }
}
