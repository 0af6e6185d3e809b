package graft.chsql

import scala.util.Random

import graft.SparkSpec

/** Metamorphic fuzz of the dialect layer: no external oracle, just
  * algebraic laws that must hold for EVERY predicate — so the generator
  * can roam the ClickHouse spellings (enum numeric comparisons,
  * `multiIf`, `position`, modulo, BETWEEN, nested NOT/AND/OR) and any
  * rewriter bug that changes semantics breaks a law. Fixed seed; ~30
  * random predicates per law, each a real query through [[ChSession]].
  *
  * Laws:
  *  - partition: count(P) + count(NOT P) = N (non-nullable columns);
  *  - wrap invariance: filtering the table = filtering a subquery of it;
  *  - aggregation split: sum(v) = sumIf(v, P) + sumIf(v, NOT P);
  *  - group totals: the group-by counts sum to N;
  *  - spelling equivalence: `count()` = `count(*)`, `multiIf` = CASE.
  */
class ChSqlMetamorphicSpec extends SparkSpec {

  private lazy val s = {
    val ss = new ChSession(spark)
    ss.execute(
      "CREATE TABLE mt (id UInt32, grp Enum8('red' = 1, 'green' = 2, " +
        "'blue' = 3), v Int32, s String) ENGINE = Memory; " +
        "INSERT INTO mt SELECT number, " +
        "multiIf(number % 3 = 0, 'red', number % 3 = 1, 'green', 'blue'), " +
        "toInt32(number * 7 % 101 - 50), " +
        "concat('w', toString(number % 17)) FROM numbers(200)")
    ss
  }
  private val N = 200L

  private def one(q: String): Long =
    s.sql(q).collect().head.getLong(0)

  /** Random CH-spelled predicate over the non-nullable columns. */
  private def pred(r: Random, depth: Int): String =
    if (depth == 0) r.nextInt(7) match {
      case 0 => s"v > ${r.nextInt(101) - 50}"
      case 1 => s"v % ${r.nextInt(5) + 2} = ${r.nextInt(2)}"
      case 2 => s"id BETWEEN ${r.nextInt(100)} AND ${100 + r.nextInt(100)}"
      case 3 => s"s LIKE '%${r.nextInt(17)}%'"
      case 4 => // enum by label or by NUMBER (the r7 mapping)
        if (r.nextBoolean()) s"grp = ${r.nextInt(3) + 1}"
        else s"grp IN ('red', '${Seq("green", "blue")(r.nextInt(2))}')"
      case 5 => s"position(s, '${r.nextInt(17)}') > 0"
      case 6 => s"grp NOT IN (${r.nextInt(3) + 1})"
    } else r.nextInt(3) match {
      case 0 => s"(${pred(r, depth - 1)}) AND (${pred(r, depth - 1)})"
      case 1 => s"(${pred(r, depth - 1)}) OR (${pred(r, depth - 1)})"
      case 2 => s"NOT (${pred(r, depth - 1)})"
    }

  private def preds(seed: Int, n: Int): Seq[String] = {
    val r = new Random(seed)
    Seq.fill(n)(pred(r, r.nextInt(3)))
  }

  test("partition law: count(P) + count(NOT P) = N for 30 random " +
    "ClickHouse-spelled predicates") {
    preds(101, 30).foreach { p =>
      val a = one(s"SELECT count() AS c FROM mt WHERE $p")
      val b = one(s"SELECT count() AS c FROM mt WHERE NOT ($p)")
      assert(a + b == N, s"$p: $a + $b != $N")
    }
  }

  test("wrap invariance: filtering the table equals filtering a " +
    "subquery of it") {
    preds(202, 20).foreach { p =>
      val a = one(s"SELECT count() AS c FROM mt WHERE $p")
      val b = one(
        s"SELECT count() AS c FROM (SELECT * FROM mt) WHERE $p")
      assert(a == b, s"$p: $a != $b")
    }
  }

  test("aggregation split: sum(v) = sumIf(v, P) + sumIf(v, NOT P)") {
    val total = one("SELECT toInt64(sum(v)) AS t FROM mt")
    preds(303, 20).foreach { p =>
      // coalesce: a predicate matching no rows sums to NULL (the
      // DuckDB-oracled SQL semantics this engine follows)
      val split = one("SELECT toInt64(coalesce(sumIf(v, " + p +
        "), 0) + coalesce(sumIf(v, NOT (" + p + ")), 0)) AS t FROM mt")
      assert(split == total, s"$p: $split != $total")
    }
  }

  test("group totals: per-group counts sum back to N under any filter " +
    "partition") {
    preds(404, 10).foreach { p =>
      val rows = s.sql("SELECT grp, count() AS c FROM mt WHERE " + p +
        " GROUP BY grp").collect()
      val a = rows.map(_.getLong(1)).sum
      val b = one(s"SELECT count() AS c FROM mt WHERE $p")
      assert(a == b, s"$p: group sum $a != count $b")
    }
  }

  test("spelling equivalence: count() = count(*), multiIf = CASE, " +
    "numeric enum = label enum") {
    preds(505, 15).foreach { p =>
      val a = one(s"SELECT count() AS c FROM mt WHERE $p")
      val b = one(s"SELECT count(*) AS c FROM mt WHERE $p")
      assert(a == b, s"$p: count() $a != count(*) $b")
      val m = one("SELECT toInt64(sum(multiIf(" + p +
        ", 1, 0))) AS c FROM mt")
      val cse = one("SELECT toInt64(sum(CASE WHEN " + p +
        " THEN 1 ELSE 0 END)) AS c FROM mt")
      assert(m == cse && m == a, s"$p: multiIf $m / CASE $cse / count $a")
    }
    // numeric and label spellings of the same enum comparison agree
    assert(one("SELECT count() AS c FROM mt WHERE grp = 2") ==
      one("SELECT count() AS c FROM mt WHERE grp = 'green'"))
    assert(one("SELECT count() AS c FROM mt WHERE grp NOT IN (1, 3)") ==
      one("SELECT count() AS c FROM mt WHERE grp = 'green'"))
  }

  test("LIMIT is a prefix under a total order, for any filter") {
    preds(606, 10).foreach { p =>
      val small = s.sql("SELECT id FROM mt WHERE " + p +
        " ORDER BY id LIMIT 5").collect().map(_.getLong(0)).toSeq
      val big = s.sql("SELECT id FROM mt WHERE " + p +
        " ORDER BY id LIMIT 12").collect().map(_.getLong(0)).toSeq
      assert(big.startsWith(small), s"$p: $small not a prefix of $big")
    }
  }

  test("UNION ALL doubles any filtered count") {
    preds(707, 10).foreach { p =>
      val a = one(s"SELECT count() AS c FROM mt WHERE $p")
      val u = one("SELECT count() AS c FROM (SELECT id FROM mt WHERE " +
        p + " UNION ALL SELECT id FROM mt WHERE " + p + ")")
      assert(u == 2 * a, s"$p: $u != 2*$a")
    }
  }
}
