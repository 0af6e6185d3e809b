package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks of the sequence-aggregate scan logic against
  * brute-force reference implementations (exhaustive chain / assignment
  * enumeration — exponential, fine at fixture size). No Spark session:
  * the aggregators' finish() is driven directly on hand-built buffers,
  * so hundreds of cases run in milliseconds.
  */
class FunnelPropertySpec extends AnyFunSuite {

  private def buf(evs: Seq[(Long, Int)]): EvBuf =
    EvBuf(evs.length, evs.map(_._1).toArray, evs.map(_._2).toArray)

  /** (ts, condIdx) entries expanded from masks, in the scan's sort order. */
  private def expanded(evs: Seq[(Long, Int)]): Vector[(Long, Int)] =
    evs.flatMap { case (t, m) =>
      (0 until 32).filter(i => (m & (1 << i)) != 0).map(t -> _)
    }.sortBy(identity).toVector

  /** Brute-force windowFunnel (default mode): the longest prefix 0..L-1
    * assignable to expanded entries at non-decreasing sort positions with
    * every chain timestamp within `window` of the chain's first.
    */
  private def bruteFunnel(evs: Seq[(Long, Int)], n: Int, window: Long): Int = {
    val ex = expanded(evs)
    def reach(level: Int, from: Int, first: Long): Int = {
      if (level == n) return n
      var best = level
      for (p <- from until ex.length) {
        val (t, i) = ex(p)
        if (i == level) {
          val f = if (level == 0) t else first
          if (level == 0 || t - f <= window)
            best = math.max(best, reach(level + 1, p + 1, f))
        }
      }
      best
    }
    reach(0, 0, 0L)
  }

  /** Brute-force sequenceMatch: does ANY strictly-increasing assignment
    * of pattern steps to mask-level events satisfy conditions, adjacency
    * and time constraints? Returns the smallest end position of a match
    * in `evs` sorted order (or -1). Mirrors the documented semantics:
    * events match conditions by bitmask; `.*` permits gaps, otherwise
    * the next MATCHING event must be the one that advances.
    */
  private def bruteMatchEnd(sorted: Vector[(Long, Int)],
                            steps: Array[SeqStep], from: Int): Int = {
    def ok(prevT: Long, st: SeqStep, t: Long): Boolean =
      st.tcOp == null || (st.tcOp match {
        case "<=" => t - prevT <= st.tcVal
        case "<"  => t - prevT < st.tcVal
        case ">=" => t - prevT >= st.tcVal
        case ">"  => t - prevT > st.tcVal
      })
    def assign(si: Int, pos: Int, prevT: Long): Int = {
      if (si == steps.length) return pos - 1 // end position of last match
      val st = steps(si)
      val cands =
        if (si > 0 && !st.gapBefore) Seq(pos) // adjacent: exactly the next event
        else pos until sorted.length
      var best = -1
      for (p <- cands if p < sorted.length) {
        val (t, m) = sorted(p)
        if ((m & (1 << st.cond)) != 0 && (si == 0 || ok(prevT, st, t))) {
          val e = assign(si + 1, p + 1, t)
          if (e >= 0 && (best < 0 || e < best)) best = e
        }
      }
      best
    }
    assign(0, from, 0L) // a match may start at any position >= from
  }

  private def bruteSeq(evs: Seq[(Long, Int)], pattern: String, n: Int,
                       countAll: Boolean): Long = {
    val steps = SeqPattern.parse(pattern, n)
    val sorted = evs.filter(_._2 != 0).sortBy(identity).toVector
    var from = 0
    var c = 0L
    var done = false
    while (!done) {
      val e = bruteMatchEnd(sorted, steps, from)
      if (e < 0) done = true
      else { c += 1; from = e + 1; if (!countAll) done = true }
    }
    c
  }

  test("windowFunnel default mode equals exhaustive chain search on 400 random streams") {
    val rnd = new scala.util.Random(101)
    for (trial <- 1 to 400) {
      val n = 2 + rnd.nextInt(2) // 2..3 conditions
      val len = rnd.nextInt(13)
      val evs = Seq.fill(len)(
        (rnd.nextInt(16).toLong,
          1 + rnd.nextInt((1 << n) - 1))) // non-zero mask, may be multi-bit
      val window = 1L + rnd.nextInt(10)
      val agg = new WindowFunnelAggregator(window, n)
      val got = agg.finish(buf(rnd.shuffle(evs)))
      val want = bruteFunnel(evs, n, window)
      assert(got == want,
        s"trial $trial: funnel($window) on $evs → got $got want $want")
    }
  }

  test("sequenceMatch/Count equal brute-force assignment search on 600 random cases") {
    val rnd = new scala.util.Random(202)
    val ops = Array("<", "<=", ">", ">=")
    for (trial <- 1 to 600) {
      val n = 2 + rnd.nextInt(2)
      // random pattern: 1..3 steps, random gaps, at most one tc per gap
      val nSteps = 1 + rnd.nextInt(3)
      val pat = new StringBuilder
      for (s <- 0 until nSteps) {
        if (s > 0) {
          if (rnd.nextBoolean()) pat ++= ".*"
          if (rnd.nextInt(3) == 0)
            pat ++= s"(?t${ops(rnd.nextInt(4))}${rnd.nextInt(12)})"
        }
        pat ++= s"(?${1 + rnd.nextInt(n)})"
      }
      val len = rnd.nextInt(13)
      val evs = Seq.fill(len)(
        (rnd.nextInt(16).toLong, 1 + rnd.nextInt((1 << n) - 1)))
      val p = pat.toString
      val m = new SequenceMatchAggregator(p, n)
      val c = new SequenceCountAggregator(p, n)
      val gotM = m.finish(buf(rnd.shuffle(evs)))
      val gotC = c.finish(buf(rnd.shuffle(evs)))
      val wantC = bruteSeq(evs, p, n, countAll = true)
      val wantM = wantC > 0
      assert(gotM == wantM, s"trial $trial: match '$p' on $evs → $gotM want $wantM")
      assert(gotC == wantC, s"trial $trial: count '$p' on $evs → $gotC want $wantC")
    }
  }
}
