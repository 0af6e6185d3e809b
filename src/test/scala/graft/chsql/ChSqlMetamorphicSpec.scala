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
  *  - spelling equivalence: `count()` = `count(*)`, `multiIf` = CASE;
  *  - join/window laws (r8): cardinality under keyed-unique right,
  *    INNER+ANTI complement, ANY LEFT/RIGHT counts, ANY INNER = SEMI,
  *    commutation, running-sum tails, row_number sizes, LIMIT BY,
  *    WITH FILL;
  *  - combinator/clause laws (r8): State/Merge round trip, PREWHERE =
  *    WHERE, DISTINCT = uniqExact = GROUP BY keys, groupArray∘arrayJoin
  *    identity, HAVING = subquery filter, INTERSECT/EXCEPT partition,
  *    ReplacingMergeTree FINAL = argMax-by-version.
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
        "concat('w', toString(number % 17)) FROM numbers(200); " +
        // join fixtures: dim is keyed-UNIQUE but PARTIAL (keys 0..11 of
        // mt's fk range 0..16, so INNER genuinely drops rows); dup has
        // 3-4 rows per key (keys 0..10) so ANY JOIN has real choice
        "CREATE TABLE dim (k UInt32, name String) ENGINE = Memory; " +
        "INSERT INTO dim SELECT number, concat('d', toString(number)) " +
        "FROM numbers(12); " +
        "CREATE TABLE dup (k UInt32, tag String) ENGINE = Memory; " +
        "INSERT INTO dup SELECT number % 11, concat('t', toString(number)) " +
        "FROM numbers(40)")
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

  // ------------------------------------------------------ join laws

  /** The filtered left side as a derived table exposing the join key. */
  private def leftSide(p: String): String =
    s"(SELECT id % 17 AS fk, v FROM mt WHERE $p) AS l"

  test("join cardinality laws: LEFT keeps |left| under a keyed-unique " +
    "right; INNER + LEFT ANTI = |left|; SEMI = INNER on unique keys") {
    preds(808, 12).foreach { p =>
      val leftN = one(s"SELECT count() AS c FROM mt WHERE $p")
      val lj = one("SELECT count() AS c FROM " + leftSide(p) +
        " LEFT JOIN dim AS d ON l.fk = d.k")
      assert(lj == leftN, s"$p: LEFT $lj != left count $leftN")
      val inner = one("SELECT count() AS c FROM " + leftSide(p) +
        " INNER JOIN dim AS d ON l.fk = d.k")
      val anti = one("SELECT count() AS c FROM " + leftSide(p) +
        " LEFT ANTI JOIN dim AS d ON l.fk = d.k")
      assert(inner + anti == leftN,
        s"$p: INNER $inner + ANTI $anti != left count $leftN")
      // on a keyed-unique right, SEMI and INNER agree — and both equal
      // the directly computable count of matched fks
      val semi = one("SELECT count() AS c FROM " + leftSide(p) +
        " LEFT SEMI JOIN dim AS d ON l.fk = d.k")
      val direct = one(
        s"SELECT count() AS c FROM mt WHERE ($p) AND id % 17 < 12")
      assert(semi == inner && semi == direct,
        s"$p: SEMI $semi / INNER $inner / direct $direct")
    }
  }

  test("ANY LEFT JOIN law: row count = |left| even when the right side " +
    "has duplicate keys (at most one match per left row)") {
    preds(818, 10).foreach { p =>
      val leftN = one(s"SELECT count() AS c FROM mt WHERE $p")
      val anyLeft = one("SELECT count() AS c FROM " + leftSide(p) +
        " ANY LEFT JOIN dup AS d ON l.fk = d.k")
      assert(anyLeft == leftN, s"$p: ANY LEFT $anyLeft != $leftN")
      // plain LEFT against the duplicated right INFLATES: every left row
      // still appears at least once
      val plainLeft = one("SELECT count() AS c FROM " + leftSide(p) +
        " LEFT JOIN dup AS d ON l.fk = d.k")
      assert(plainLeft >= leftN, s"$p: LEFT $plainLeft < $leftN")
    }
  }

  test("ANY RIGHT JOIN law: row count = |right| even when the left side " +
    "has duplicate keys (at most one left match per right row)") {
    val rightN = one("SELECT count() AS c FROM dup")
    preds(838, 8).foreach { p =>
      val anyRight = one("SELECT count() AS c FROM " + leftSide(p) +
        " ANY RIGHT JOIN dup AS d ON l.fk = d.k")
      assert(anyRight == rightN, s"$p: ANY RIGHT $anyRight != $rightN")
      // plain RIGHT against the duplicate-fk left INFLATES; every right
      // row still appears at least once
      val plainRight = one("SELECT count() AS c FROM " + leftSide(p) +
        " RIGHT JOIN dup AS d ON l.fk = d.k")
      assert(plainRight >= rightN, s"$p: RIGHT $plainRight < $rightN")
    }
  }

  test("kind-first ANY spelling law: RIGHT ANY JOIN = ANY RIGHT JOIN " +
    "and LEFT ANY JOIN = ANY LEFT JOIN, for any left filter") {
    // ClickHouse accepts both orders (hw06.md uses `left ANY join`);
    // pre-r9 the kind-first RIGHT spelling silently deduped the wrong
    // (kept) side
    val rightN = one("SELECT count() AS c FROM dup")
    preds(858, 6).foreach { p =>
      val leftN = one(s"SELECT count() AS c FROM mt WHERE $p")
      val kindFirstLeft = one("SELECT count() AS c FROM " + leftSide(p) +
        " LEFT ANY JOIN dup AS d ON l.fk = d.k")
      assert(kindFirstLeft == leftN,
        s"$p: LEFT ANY $kindFirstLeft != left count $leftN")
      val kindFirstRight = one("SELECT count() AS c FROM " + leftSide(p) +
        " RIGHT ANY JOIN dup AS d ON l.fk = d.k")
      assert(kindFirstRight == rightN,
        s"$p: RIGHT ANY $kindFirstRight != right count $rightN")
      val kindFirstInner = one("SELECT count() AS c FROM " + leftSide(p) +
        " INNER ANY JOIN dup AS d ON l.fk = d.k")
      val semi = one("SELECT count() AS c FROM " + leftSide(p) +
        " LEFT SEMI JOIN dup AS d ON l.fk = d.k")
      assert(kindFirstInner == semi,
        s"$p: INNER ANY $kindFirstInner != SEMI $semi")
    }
  }

  test("ANY INNER JOIN law: count = SEMI count (one right match per " +
    "left row, rows with no match drop), for any left filter") {
    preds(848, 8).foreach { p =>
      val anyInner = one("SELECT count() AS c FROM " + leftSide(p) +
        " ANY INNER JOIN dup AS d ON l.fk = d.k")
      val semi = one("SELECT count() AS c FROM " + leftSide(p) +
        " LEFT SEMI JOIN dup AS d ON l.fk = d.k")
      assert(anyInner == semi, s"$p: ANY INNER $anyInner != SEMI $semi")
    }
  }

  test("dictGet law: dictGetOrDefault over a key expression equals the " +
    "LEFT JOIN of the dictionary's source table, for any left filter") {
    // the r8 ANY-join degrade bug is exactly the class this law catches:
    // a lookup path silently disagreeing with its relational spelling
    s.execute(
      """CREATE DICTIONARY mdict (k UInt64, name String) PRIMARY KEY k
        |  SOURCE(CLICKHOUSE(HOST 'localhost' PORT 9000 USER 'default'
        |    TABLE 'dim' PASSWORD '' DB 'default'))
        |  LAYOUT(HASHED()) LIFETIME(MIN 0 MAX 10)""".stripMargin)
    def rows(q: String): Seq[(Long, String)] =
      s.sql(q).collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    preds(868, 8).foreach { p =>
      // id % 17 roams over keys 12..16 too — genuine misses (dim holds
      // 0..11), marked explicitly on both sides: dictGetOrDefault's
      // default vs the join's unmatched type-default '' — the
      // join_use_nulls = 0 coalesce wrap this law originally caught
      // missing (alias-qualified refs are the wrap's documented scope,
      // hence d.name)
      val viaDict = rows(
        s"SELECT id, dictGetOrDefault('mdict', 'name', toUInt64(id % 17), " +
          s"'MISS') AS nm FROM mt WHERE $p")
      val viaJoin = rows(
        s"SELECT id, if(d.name = '', 'MISS', d.name) AS nm FROM " +
          s"(SELECT * FROM mt WHERE $p) AS m LEFT JOIN dim AS d " +
          "ON m.id % 17 = d.k")
      assert(viaDict == viaJoin,
        s"$p: dictGet and LEFT JOIN disagree: " +
          s"${viaDict.diff(viaJoin).take(3)} vs ${viaJoin.diff(viaDict).take(3)}")
    }
  }

  test("join/filter commutation: filtering the left before the join " +
    "equals filtering the joined result on left columns") {
    preds(828, 10).foreach { p =>
      val before = one("SELECT count() AS c FROM " +
        s"(SELECT * FROM mt WHERE $p) AS l " +
        "INNER JOIN dim AS d ON l.id % 17 = d.k")
      // the late side must expose every predicate column, hence *
      val after = one("SELECT count() AS c FROM " +
        "(SELECT * FROM mt) AS l " +
        s"INNER JOIN dim AS d ON l.id % 17 = d.k WHERE $p")
      assert(before == after, s"$p: pushed $before != late $after")
    }
  }

  // ---------------------------------------------------- window laws

  test("window law: the running sum's last row per partition equals " +
    "the plain group sum, for any filter") {
    preds(909, 10).foreach { p =>
      val rows = s.sql("SELECT grp, id, sum(v) OVER (PARTITION BY grp " +
        s"ORDER BY id) AS rs FROM mt WHERE $p").collect()
      val totals = s.sql("SELECT grp, toInt64(sum(v)) AS t FROM mt " +
        s"WHERE $p GROUP BY grp").collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      val lastRs = rows.groupBy(_.get(0).toString).map { case (g, rs) =>
        g -> rs.maxBy(_.getLong(1)).getLong(2)
      }
      assert(lastRs == totals, s"$p: window tails $lastRs != $totals")
    }
  }

  test("window law: max(row_number) per partition equals the group " +
    "count, for any filter") {
    preds(919, 10).foreach { p =>
      val viaWindow = s.sql("SELECT grp, toInt64(max(rn)) AS m FROM (SELECT grp, " +
        "row_number() OVER (PARTITION BY grp ORDER BY id) AS rn FROM mt " +
        s"WHERE $p) GROUP BY grp").collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      val viaAgg = s.sql(
        s"SELECT grp, count() AS c FROM mt WHERE $p GROUP BY grp")
        .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
      assert(viaWindow == viaAgg, s"$p: $viaWindow != $viaAgg")
    }
  }

  test("window law: percent_rank = (rank-1)/(n-1) and cume_dist = " +
    "peers_at_or_below/n under a TIE-FUL order key, for any filter") {
    // v repeats (id*7 % 101 over 200 rows), so rank/percent_rank/
    // cume_dist genuinely diverge from row_number-based formulas —
    // the law checks the tie semantics, not just the happy path
    preds(939, 8).foreach { p =>
      val rows = s.sql("SELECT grp, v, percent_rank() OVER w AS pr, " +
        s"cume_dist() OVER w AS cd FROM mt WHERE $p " +
        "WINDOW w AS (PARTITION BY grp ORDER BY v)").collect()
        .map(r => (r.get(0).toString, r.getInt(1), r.getDouble(2), r.getDouble(3)))
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val n = rs.length
        val vs = rs.map(_._2)
        rs.foreach { case (_, v, pr, cd) =>
          val rank = 1 + vs.count(_ < v)
          val expPr = if (n == 1) 0.0 else (rank - 1).toDouble / (n - 1)
          val expCd = vs.count(_ <= v).toDouble / n
          assert(math.abs(pr - expPr) < 1e-9,
            s"$p/$g: percent_rank($v) = $pr, expected $expPr")
          assert(math.abs(cd - expCd) < 1e-9,
            s"$p/$g: cume_dist($v) = $cd, expected $expCd")
        }
        // cume_dist is monotone non-decreasing in the order key
        val sorted = rs.sortBy(_._2)
        sorted.sliding(2).foreach { w =>
          if (w.length == 2) assert(w(0)._4 <= w(1)._4 + 1e-12,
            s"$p/$g: cume_dist not monotone at v=${w(1)._2}")
        }
      }
    }
  }

  test("window law: ntile(b) bucket sizes differ by at most 1, cover " +
    "min(b, n) buckets, and sum to the partition size, for any filter") {
    preds(949, 8).foreach { p =>
      Seq(3, 4, 7).foreach { b =>
        val rows = s.sql(s"SELECT grp, ntile($b) OVER (PARTITION BY grp " +
          s"ORDER BY v) AS nt FROM mt WHERE $p").collect()
          .map(r => (r.get(0).toString, r.getInt(1)))
        rows.groupBy(_._1).foreach { case (g, rs) =>
          val n = rs.length
          val sizes = rs.groupBy(_._2).view.mapValues(_.length).toMap
          assert(sizes.keySet == (1 to math.min(b, n)).toSet,
            s"$p/$g: ntile($b) buckets ${sizes.keySet} over $n rows")
          assert(sizes.values.sum == n)
          assert(sizes.values.max - sizes.values.min <= 1,
            s"$p/$g: ntile($b) sizes $sizes not within 1")
          // earlier buckets take the remainder rows first
          val bySize = (1 to math.min(b, n)).map(sizes)
          bySize.sliding(2).foreach { w =>
            if (w.length == 2) assert(w(0) >= w(1),
              s"$p/$g: ntile($b) sizes $bySize not front-loaded")
          }
        }
      }
    }
  }

  test("LIMIT n BY k law: at most n rows per key, every row a member " +
    "of the unlimited result") {
    preds(929, 8).foreach { p =>
      val lim = s.sql(s"SELECT s, id FROM mt WHERE $p ORDER BY id " +
        "LIMIT 3 BY s").collect()
      val all = s.sql(s"SELECT s, id FROM mt WHERE $p").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      lim.groupBy(_.getString(0)).foreach { case (k, rs) =>
        assert(rs.length <= 3, s"$p: key $k kept ${rs.length} rows")
      }
      lim.foreach(r =>
        assert(all((r.getString(0), r.getLong(1))),
          s"$p: LIMIT BY invented row ${r.mkString(",")}"))
    }
  }

  // ------------------------------------- combinator / clause laws (r8)

  test("State/Merge round trip: sumMerge(sumState), countMerge" +
    "(countState) and uniqExactMerge(uniqExactState) over a partial " +
    "grouping equal the direct aggregates, for any filter") {
    preds(949, 8).foreach { p =>
      val direct = s.sql("SELECT toInt64(sum(v)) AS sv, count() AS c, " +
        s"uniqExact(s) AS u FROM mt WHERE $p").collect().head
      val merged = s.sql("SELECT toInt64(sumMerge(sv)) AS sv, " +
        "countMerge(c) AS c, uniqExactMerge(u) AS u FROM (" +
        "SELECT grp, sumState(v) AS sv, countState() AS c, " +
        s"uniqExactState(s) AS u FROM mt WHERE $p GROUP BY grp)")
        .collect().head
      assert(merged.toSeq == direct.toSeq,
        s"$p: merged ${merged.mkString(",")} != direct ${direct.mkString(",")}")
    }
  }

  test("PREWHERE is WHERE: identical counts and sums for any predicate") {
    preds(959, 12).foreach { p =>
      val w = s.sql("SELECT count() AS c, toInt64(coalesce(sum(v), 0)) " +
        s"AS sv FROM mt WHERE $p").collect().head
      val pw = s.sql("SELECT count() AS c, toInt64(coalesce(sum(v), 0)) " +
        s"AS sv FROM mt PREWHERE $p").collect().head
      assert(w.toSeq == pw.toSeq,
        s"$p: WHERE ${w.mkString(",")} != PREWHERE ${pw.mkString(",")}")
    }
  }

  test("DISTINCT law: count of SELECT DISTINCT = uniqExact = count of " +
    "GROUP BY keys, for any filter") {
    preds(969, 10).foreach { p =>
      val viaDistinct = one(
        s"SELECT count() AS c FROM (SELECT DISTINCT s FROM mt WHERE $p)")
      val viaUniq = one(s"SELECT uniqExact(s) AS c FROM mt WHERE $p")
      val viaGroup = one("SELECT count() AS c FROM " +
        s"(SELECT s FROM mt WHERE $p GROUP BY s)")
      assert(viaDistinct == viaUniq && viaUniq == viaGroup,
        s"$p: DISTINCT $viaDistinct / uniqExact $viaUniq / GROUP $viaGroup")
    }
  }

  test("groupArray / arrayJoin round trip: exploding the per-group " +
    "arrays restores the filtered row count and value sum") {
    preds(979, 8).foreach { p =>
      val direct = s.sql("SELECT count() AS c, toInt64(coalesce(sum(v), " +
        s"0)) AS sv FROM mt WHERE $p").collect().head
      val rt = s.sql("SELECT count() AS c, toInt64(coalesce(sum(x), 0)) " +
        "AS sv FROM (SELECT arrayJoin(a) AS x FROM " +
        s"(SELECT grp, groupArray(v) AS a FROM mt WHERE $p GROUP BY grp))")
        .collect().head
      assert(rt.toSeq == direct.toSeq,
        s"$p: round trip ${rt.mkString(",")} != ${direct.mkString(",")}")
    }
  }

  test("HAVING law: HAVING on a grouped result = WHERE over the " +
    "grouped subquery, for any filter") {
    preds(989, 8).foreach { p =>
      val having = s.sql(s"SELECT grp, count() AS c FROM mt WHERE $p " +
        "GROUP BY grp HAVING count() > 3").collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      val sub = s.sql("SELECT grp, c FROM (SELECT grp, count() AS c " +
        s"FROM mt WHERE $p GROUP BY grp) WHERE c > 3").collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      assert(having == sub, s"$p: HAVING $having != subquery $sub")
    }
  }

  test("set-operation partition: |A INTERSECT B| + |A EXCEPT B| = " +
    "|distinct A|, for any predicate pair") {
    val ps = preds(999, 12)
    ps.grouped(2).collect { case Seq(p, q) => (p, q) }.foreach {
      case (p, q) =>
        val inter = one("SELECT count() AS c FROM (SELECT id FROM mt " +
          s"WHERE $p INTERSECT SELECT id FROM mt WHERE $q)")
        val except = one("SELECT count() AS c FROM (SELECT id FROM mt " +
          s"WHERE $p EXCEPT SELECT id FROM mt WHERE $q)")
        val distinctA = one(
          s"SELECT count() AS c FROM (SELECT DISTINCT id FROM mt WHERE $p)")
        assert(inter + except == distinctA,
          s"$p / $q: $inter + $except != $distinctA")
    }
  }

  test("FINAL law on ReplacingMergeTree: FINAL sees exactly one row " +
    "per key (the max-version one), for any filter over final rows") {
    // built once here, not in the shared fixture: three versions per key
    s.execute(
      "CREATE TABLE rmt (k UInt32, ver UInt32, v Int32) " +
        "ENGINE = ReplacingMergeTree(ver) ORDER BY k; " +
        "INSERT INTO rmt SELECT number % 40, 1, toInt32(number) " +
        "FROM numbers(40); " +
        "INSERT INTO rmt SELECT number % 40, 2, toInt32(number + 1000) " +
        "FROM numbers(80); " +
        "INSERT INTO rmt SELECT number % 20, 3, toInt32(number + 5000) " +
        "FROM numbers(20)")
    assert(one("SELECT count() AS c FROM rmt FINAL") == 40L)
    // every FINAL row is the argMax-by-version row of its key
    // (stringly-keyed: UInt32/Int32 physical types vary by path)
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.get(0).toString, (r.get(1).toString, r.get(2).toString)))
        .toMap
    val finalRows = asMap(s.sql("SELECT k, ver, v FROM rmt FINAL").collect())
    val expect = asMap(s.sql("SELECT k, toUInt32(max(ver)) AS ver, " +
      "argMax(v, ver) AS v FROM rmt GROUP BY k").collect())
    assert(finalRows == expect, "FINAL rows are not the max-version rows")
    // filters commute with FINAL when the predicate is on final values
    Seq("v >= 1000", "k % 3 = 0", "v % 2 = 1 AND k < 30").foreach { p =>
      val a = one(s"SELECT count() AS c FROM rmt FINAL WHERE $p")
      val b = one("SELECT count() AS c FROM (SELECT k, " +
        s"argMax(v, ver) AS v FROM rmt GROUP BY k) WHERE $p")
      assert(a == b, s"$p: FINAL-filtered $a != argMax-view $b")
    }
    s.execute("DROP TABLE rmt")
    ()
  }

  test("WITH FILL law: output is the contiguous id range covering the " +
    "original rows (default step 1), for any filter") {
    preds(939, 6).foreach { p =>
      val orig = s.sql(s"SELECT id FROM mt WHERE $p ORDER BY id")
        .collect().map(_.getLong(0)).toSet
      val filled = s.sql(
        s"SELECT id FROM mt WHERE $p ORDER BY id WITH FILL")
        .collect().map(_.getLong(0)).toSeq
      assert(orig.subsetOf(filled.toSet),
        s"$p: WITH FILL lost original rows")
      if (orig.nonEmpty)
        assert(filled == (orig.min to orig.max).toSeq,
          s"$p: WITH FILL output is not the contiguous covering range")
    }
  }

  test("CTE self-wrap law (r13): prefixing `WITH t AS (SELECT <cols> " +
    "FROM t)` for EVERY table leaves any query's result unchanged — " +
    "each CTE shadows its own catalog table (its body reads the catalog, " +
    "the non-recursive rule), so scope resolution, the defaults pass, " +
    "the ANTI pass and the probe are pressure-tested on the whole corpus") {
    // a chained prefix: three same-named wraps, each trivially renaming
    val prefix = "WITH mt AS (SELECT id, grp, v, s FROM mt), " +
      "dim AS (SELECT k, name FROM dim), " +
      "dup AS (SELECT k, tag FROM dup) "
    def rows(q: String): Seq[Vector[String]] =
      s.sql(q).collect().toSeq.map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "NULL" else r.get(i).toString).toVector)
        .sortBy(_.mkString("|"))
    val qs = scala.collection.mutable.ArrayBuffer.empty[String]
    preds(997, 8).foreach { p =>
      qs += s"SELECT count() AS c FROM mt WHERE $p"
      qs += s"SELECT grp, count() AS c, sum(v) AS sv FROM mt WHERE $p GROUP BY grp"
    }
    qs += "SELECT m.id AS id, d.name AS nm FROM mt m INNER JOIN dim d ON m.id % 17 = d.k"
    qs += "SELECT m.id AS id, d.name AS nm FROM mt m LEFT JOIN dim d ON m.id % 17 = d.k"
    qs += "SELECT m.id AS id, d.tag AS tg FROM mt m ANY LEFT JOIN dup d ON m.id % 11 = d.k"
    qs += "SELECT m.id AS id, d.name AS nm FROM mt m LEFT JOIN dim d " +
      "ON m.id % 17 = d.k SETTINGS join_use_nulls = 1"
    qs += "SELECT m.id AS id FROM mt m LEFT ANTI JOIN dim d ON m.id % 17 = d.k"
    qs += "SELECT m.id AS id, d.name AS nm FROM mt m LEFT ANTI JOIN dim d " +
      "ON m.id % 17 = d.k"
    qs += "SELECT count() AS c FROM mt PREWHERE v > 0"
    qs += "SELECT grp, sum(v) AS sv FROM mt GROUP BY grp WITH TOTALS"
    qs += "SELECT id FROM mt WHERE id IN (SELECT k FROM dim)"
    qs += "SELECT id, v, sum(v) OVER (PARTITION BY grp ORDER BY id) AS rs " +
      "FROM mt ORDER BY id LIMIT 50"
    qs += "SELECT grp, id, v FROM mt ORDER BY grp, v DESC, id LIMIT 3 BY grp"
    qs += "SELECT k FROM dim INTERSECT SELECT k FROM dup"
    qs += "SELECT uniqExact(s) AS u FROM mt"
    qs += "SELECT m.id AS id, x.tag AS tg FROM mt m LEFT JOIN " +
      "(SELECT k, tag FROM dup WHERE k < 5) x ON m.id % 11 = x.k"
    val diffs = qs.flatMap { q =>
      (try Right((rows(q), rows(prefix + q)))
       catch { case e: Exception =>
         Left(e.getMessage.linesIterator.next())
       }) match {
        case Left(err) => Some(s"$q\n  threw: $err")
        case Right((plain, wrapped)) if plain != wrapped =>
          Some(s"$q\n  plain ${plain.size} rows ${plain.take(3)}" +
            s"\n  wrapped ${wrapped.size} rows ${wrapped.take(3)}")
        case _ => None
      }
    }
    assert(qs.size >= 30)
    assert(diffs.isEmpty,
      s"${diffs.size} queries changed under the CTE self-wrap:\n" +
        diffs.take(6).mkString("\n"))
  }
}
