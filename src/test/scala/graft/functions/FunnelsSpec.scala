package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, Long, String)*) =
    rows.toDF("uid", "t", "e")

  private def conds(names: String*) = names.map(n => $"e" === n)

  test("windowFunnel: level counts consecutive steps within the window of the chain start") {
    val df = events(
      // u1: full A->B->C chain inside window 10
      (1L, 0L, "A"), (1L, 4L, "B"), (1L, 9L, "C"),
      // u2: C arrives outside window of the chain start
      (2L, 0L, "A"), (2L, 4L, "B"), (2L, 11L, "C"),
      // u3: B before any A never counts
      (3L, 0L, "B"), (3L, 5L, "C"),
      // u4: a later A restarts the window and rescues the chain
      (4L, 0L, "A"), (4L, 8L, "A"), (4L, 12L, "B"), (4L, 17L, "C"))
    val got = df.groupBy($"uid")
      .agg(Funnels.windowFunnel(10L, $"t", conds("A", "B", "C")).as("lvl"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 3))
  }

  test("windowFunnel: equal timestamps chain in condition order; strictIncrease forbids them") {
    val df = events((1L, 5L, "A"), (1L, 5L, "B"))
    val loose = df.groupBy($"uid")
      .agg(Funnels.windowFunnel(10L, $"t", conds("A", "B")).as("lvl"))
      .as[(Long, Int)].collect().toMap
    val strict = df.groupBy($"uid")
      .agg(Funnels.windowFunnel(10L, $"t", conds("A", "B"),
        strictIncrease = true).as("lvl"))
      .as[(Long, Int)].collect().toMap
    assert(loose == Map(1L -> 2))
    assert(strict == Map(1L -> 1))
  }

  test("windowFunnel: result is partitioning-independent (partial merge)") {
    val rnd = new scala.util.Random(11)
    val types = Array("A", "B", "C", "X")
    val rows = (1 to 5000).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(500).toLong, types(rnd.nextInt(4))))
    val one = events(rows: _*).coalesce(1)
    val many = events(rows: _*).repartition(13)
    def lvl(df: org.apache.spark.sql.DataFrame) = df.groupBy($"uid")
      .agg(Funnels.windowFunnel(50L, $"t", conds("A", "B", "C")).as("lvl"))
      .as[(Long, Int)].collect().toMap
    assert(lvl(one) == lvl(many))
  }

  test("retention: anchored flags") {
    val df = events(
      (1L, 0L, "A"), (1L, 1L, "C"),          // anchor + third, no second
      (2L, 0L, "B"), (2L, 1L, "C"),          // no anchor: all zero
      (3L, 0L, "A"), (3L, 1L, "B"), (3L, 2L, "C"))
    val got = df.groupBy($"uid")
      .agg(Funnels.retention(conds("A", "B", "C")).as("r"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == Map(1L -> Seq(1, 0, 1), 2L -> Seq(0, 0, 0),
      3L -> Seq(1, 1, 1)))
  }

  test("sequenceMatch: gap vs adjacency among matching events") {
    // u1 stream (matching events): A B ; u2: A X-ignored B ; u3: A C B
    val df = events(
      (1L, 0L, "A"), (1L, 5L, "B"),
      (2L, 0L, "A"), (2L, 2L, "X"), (2L, 5L, "B"), // X matches no condition
      (3L, 0L, "A"), (3L, 2L, "C"), (3L, 5L, "B")) // C is condition 3
    def m(pat: String) = df.groupBy($"uid")
      .agg(Funnels.sequenceMatch(pat, $"t", conds("A", "B", "C")).as("ok"))
      .as[(Long, Boolean)].collect().toMap
    // adjacent: the C event interrupts u3 only
    assert(m("(?1)(?2)") == Map(1L -> true, 2L -> true, 3L -> false))
    // gapped: all three match
    assert(m("(?1).*(?2)") == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("sequenceMatch: time constraints bind consecutive steps") {
    val df = events(
      (1L, 0L, "A"), (1L, 3L, "B"),   // 3s apart
      (2L, 0L, "A"), (2L, 30L, "B"))  // 30s apart
    def m(pat: String) = df.groupBy($"uid")
      .agg(Funnels.sequenceMatch(pat, $"t", conds("A", "B")).as("ok"))
      .as[(Long, Boolean)].collect().toMap
    assert(m("(?1)(?t<=10)(?2)") == Map(1L -> true, 2L -> false))
    assert(m("(?1)(?t>10)(?2)") == Map(1L -> false, 2L -> true))
  }

  test("sequenceMatch time constraint: the latest viable previous step wins") {
    // A@0 then A@20 then B@25: (?t<=10) must use the A@20 chain
    val df = events((1L, 0L, "A"), (1L, 20L, "A"), (1L, 25L, "B"))
    val got = df.groupBy($"uid")
      .agg(Funnels.sequenceMatch("(?1)(?t<=10)(?2)", $"t",
        conds("A", "B")).as("ok"))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true))
  }

  test("sequenceCount: non-overlapping matches, NFA restarts after each") {
    // A B A B      -> 2 ;  A A B B -> 1 (first B consumes, second lacks a new A)
    val df = events(
      (1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "A"), (1L, 3L, "B"),
      (2L, 0L, "A"), (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "B"))
    val got = df.groupBy($"uid")
      .agg(Funnels.sequenceCount("(?1).*(?2)", $"t", conds("A", "B")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("null timestamps and never-matching rows are ignored") {
    val df = Seq(
      (1L, Some(0L), "A"), (1L, None, "B"), (1L, Some(5L), "B"))
      .toDF("uid", "t", "e")
    val got = df.groupBy($"uid")
      .agg(Funnels.windowFunnel(10L, $"t", conds("A", "B")).as("lvl"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 2))
  }

  test("sequenceNextNode: first consecutive match wins, end-of-stream is NULL, no-match keys emit no row") {
    val df = Seq(
      // uid 1: A B X A B C — first A,B run at t=0, next node X
      (1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "X"),
      (1L, 3L, "A"), (1L, 4L, "B"), (1L, 5L, "C"),
      // uid 2: chain at the very end — next node NULL
      (2L, 0L, "X"), (2L, 1L, "A"), (2L, 2L, "B"),
      // uid 3: A and B exist but never consecutively — no row
      (3L, 0L, "A"), (3L, 1L, "X"), (3L, 2L, "B"),
      // uid 4: interleaved order pins by (t): B A B → run at t=1
      (4L, 2L, "B"), (4L, 1L, "A"), (4L, 0L, "B"), (4L, 3L, "Z"))
      .toDF("uid", "t", "e")
    val got = Funnels.sequenceNextNode(df, "uid", Seq($"t"), $"e",
        Seq($"e" === "A", $"e" === "B"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("X"), 2L -> None, 4L -> Some("Z")))
  }
}
