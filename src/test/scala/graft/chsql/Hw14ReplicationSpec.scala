package graft.chsql

import graft.SparkSpec

/** Replays homeworks/hw14.md's Вариант 1 end-to-end — personalized
  * monitoring over the system log tables: the dashboards_test CTAS from
  * system.dashboards (hw14.md:28-32), the MemoryPeak trace_log query
  * with `::INT` postfix cast + `ORDER BY t WITH FILL STEP 60`
  * (hw14.md:36-44), the two dashboard INSERTs whose query strings carry
  * `\'` backslash-escaped quotes (hw14.md:46-57, 69-78), the
  * query_log `uniqArray(tables)` per-interval monitoring query
  * (hw14.md:61-67), and the "прожорливый" numbers(offset, count) join
  * demo (hw14.md:85-90). The Graphite/Prometheus Вариант 2 is
  * infrastructure (docker + scrape configs) — out of engine scope.
  */
class Hw14ReplicationSpec extends SparkSpec {

  test("hw14: dashboards CTAS + trace_log / query_log monitoring replay") {
    val s = new ChSession(spark)
    // hw14.md:28-32 verbatim: clone system.dashboards' schema
    s.execute(
      """create table dashboards_test
        |engine=MergeTree
        |order by tuple()
        |as system.dashboards""".stripMargin)
    assert(s.sql("SELECT * FROM dashboards_test").columns.toSeq ==
      Seq("dashboard", "title", "query"))
    // hw14.md:36-44 verbatim: the debugged MemoryPeak query — ::INT
    // postfix cast, DateTime-minus-seconds, WITH FILL STEP. This engine
    // synthesizes trace_log honestly EMPTY (no native memory tracker),
    // so the query's contract here is schema + clean execution
    val peaks = s.sql(
      """select toStartOfInterval(event_time, INTERVAL 60 SECOND)::INT AS t, max(size)
        |from system.trace_log
        |where trace_type = 'MemoryPeak'
        |and event_date >= toDate(now() - 86400) and event_date >= toDate(now() - 86400)
        |GROUP BY t
        |ORDER BY t WITH FILL STEP 60""".stripMargin).collect()
    assert(peaks.isEmpty, "trace_log is synthesized empty")
    // hw14.md:46-57 verbatim: the dashboard row whose query string holds
    // \'-escaped quotes — the INSERT must survive the lexer and the
    // stored string must read back with PLAIN quotes
    s.execute(
      """insert into dashboards_test
        |values
        |('Overview', 'memory peaks', 'select toStartOfInterval(event_time, INTERVAL {rounding:UInt32} SECOND)::INT AS t, max(size)
        |from system.trace_log
        |where trace_type = \'MemoryPeak\'
        |and event_date >= toDate(now() - {seconds:UInt32}) and event_date >= toDate(now() - {seconds:UInt32})
        |GROUP BY t
        |ORDER BY t WITH FILL STEP {rounding:UInt32}
        |;')""".stripMargin)
    s.execute(
      """insert into dashboards_test
        |values
        |('Overview', 'count uniq tables', 'select toStartOfInterval(event_time, INTERVAL {rounding:UInt32} SECOND)::INT AS t, uniqArray(tables)
        |from system.query_log
        |where type=\'QueryFinish\'
        |and event_date >= toDate(now() - {seconds:UInt32}) and event_date >= toDate(now() - {seconds:UInt32})
        |GROUP BY t
        |ORDER BY t WITH FILL STEP {rounding:UInt32}
        |;')""".stripMargin)
    val stored = s.sql(
      "SELECT title, query FROM dashboards_test ORDER BY title")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(stored.map(_._1).toSeq == Seq("count uniq tables", "memory peaks"))
    assert(stored.exists(_._2.contains("where trace_type = 'MemoryPeak'")) &&
      stored.exists(_._2.contains("where type='QueryFinish'")),
      s"escaped quotes must store as plain quotes: ${stored.toSeq}")
    // hw14.md:61-67: the uniqArray(tables) monitoring query against the
    // REAL query_log — the statements above referenced dashboards_test,
    // so at least one interval row reports >= 1 unique table
    val uniq = s.sql(
      """select toStartOfInterval(event_time, INTERVAL 60 SECOND)::INT AS t, uniqArray(tables)
        |from system.query_log
        |where type='QueryFinish'
        |and event_date >= toDate(now() - 86400) and event_date >= toDate(now() - 86400)
        |GROUP BY t
        |ORDER BY t WITH FILL STEP 60""".stripMargin).collect()
    val counted = uniq.filterNot(_.isNullAt(1)).map(_.getInt(1))
    assert(counted.nonEmpty && counted.max >= 1,
      s"query_log.tables must record the referenced tables: ${uniq.toSeq}")
    // hw14.md:85-90 verbatim: the greedy two-numbers() join (the
    // lecture runs 10M vs 100; the offset form must not downscale away)
    val greedy = s.sql(
      """select count()
        |from (select number as id from numbers(10000000, 100)) t1
        |left join (select number as id from numbers(10000000)) t2 using (id)""".stripMargin)
      .collect().head.getLong(0)
    assert(greedy == 100L, s"hw14's captured count: $greedy")
  }
}
