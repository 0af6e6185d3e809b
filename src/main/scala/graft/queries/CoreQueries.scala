package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.tables.Tables
import graft.functions.ChFunctions._
import graft.functions.ChAggregates._
import graft.operators.{Joins, WithFill}
import graft.mergetree.FoldViews

/** Core relational surface (SURVEY.md §2.2-2.8): scans, filters, joins of
  * every flavor, aggregation, windows, set ops, top-k, gap fill.
  *
  * Money arithmetic goes through DecimalType so sums are exact and
  * partitioning-independent — double sums would drift from the oracle by
  * ULPs depending on reduction order. Results are cast back to double at
  * the end (matching the oracle SQL, which does the same).
  */
object CoreQueries {

  val all: Seq[Q] = Seq(

    // ---- 2.4 aggregation over a pruned scan (the TPC-H Q1 shape the
    // reference demos as its flagship MergeTree aggregation)
    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      val li = Tables(s, dir).lineitem
      li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- 2.2 predicate + projection pushdown to the parquet scan
    Q("q02_filter_pushdown",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1995-03-31 00:00:00'
        |  AND l_quantity > 30 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""") { (s, dir) =>
      val li = Tables(s, dir).lineitem
      li.filter(
          col("l_shipdate").between(
            lit("1995-01-01 00:00:00").cast(TimestampType),
            lit("1995-03-31 00:00:00").cast(TimestampType)) &&
          col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- 2.3 multi-way join, dims broadcast (flagship: revenue by nation)
    Q("q03_join_revenue_by_nation",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items,
        |  COUNT(DISTINCT c_custkey) AS n_customers
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""") { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(dec2(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy(col("n_name"))
    },

    // ---- 2.3 LEFT SEMI (WHERE ... IN subquery, lectures/lecture_10.md:10)
    Q("q04_semi_join",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
        |ORDER BY o_orderkey""") { (s, dir) =>
      val t = Tables(s, dir)
      t.orders
        .join(t.lineitem.filter(col("l_quantity") > 45)
          .select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // ---- 2.3 LEFT ANTI (homeworks/hw06.md:136-152 `left anti join`)
    Q("q05_anti_join",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""") { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(t.orders.select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ---- 2.3 LEFT ANY JOIN (homeworks/hw06.md:167-185): first match only
    Q("q06_any_join",
      """SELECT c_custkey, c_name, f.o_orderkey AS first_orderkey,
        |       CAST(f.o_orderdate AS DATE) AS first_orderdate
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, o_orderkey, o_orderdate FROM orders
        |           QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1) f
        |  ON c_custkey = f.o_custkey
        |ORDER BY c_custkey""") { (s, dir) =>
      val t = Tables(s, dir)
      val firstOrders = t.orders.select(
        col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_orderdate"))
      Joins.leftAny(t.customer, firstOrders, Seq("c_custkey"),
          Seq(col("o_orderdate").asc, col("o_orderkey").asc))
        .select(col("c_custkey"), col("c_name"),
          col("o_orderkey").as("first_orderkey"),
          col("o_orderdate").cast(DateType).as("first_orderdate"))
        .orderBy(col("c_custkey"))
    },

    // ---- 2.3 ASOF JOIN (lectures/lecture_10.md:14): latest signup state
    // attached to each purchase, per user, at second granularity.
    Q("q07_asof_join",
      """WITH r AS (
        |  SELECT user_id, ts_s, value FROM (
        |    SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_s, value,
        |           row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000000000 ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1),
        |l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s
        |  FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts_s,
        |       r.ts_s AS signup_ts_s, r.value AS signup_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_s >= r.ts_s
        |ORDER BY l.event_id""") { (s, dir) =>
      val ev = Tables(s, dir).events
      val leftSide = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"))
      val rw = Window.partitionBy(col("user_id"), col("ts_s"))
        .orderBy(col("event_id").desc)
      val rightSide = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"),
          col("value"), col("event_id"))
        .withColumn("rn", row_number().over(rw)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts_s"), col("value"))
      Joins.asofLeft(leftSide, rightSide, "user_id", "ts_s", "ts_s",
          Seq("ts_s", "value"), "signup_")
        .select(col("event_id"), col("user_id"), col("ts_s"),
          col("signup_ts_s"), col("signup_value"))
        .orderBy(col("event_id"))
    },

    // same asof semantics through the CUSTOM PHYSICAL OPERATOR
    // (plans/AsOfJoin.scala: LogicalPlan + Strategy + merge-scan SparkPlan)
    // against the same DuckDB ASOF oracle as q07
    Q("q07b_asof_native",
      """WITH r AS (
        |  SELECT user_id, ts_s, value FROM (
        |    SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_s, value,
        |           row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000000000 ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1),
        |l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s
        |  FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts_s,
        |       r.ts_s AS signup_ts_s, r.value AS signup_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_s >= r.ts_s
        |ORDER BY l.event_id""") { (s, dir) =>
      val ev = Tables(s, dir).events
      val leftSide = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"))
      val rw = Window.partitionBy(col("user_id"), col("ts_s"))
        .orderBy(col("event_id").desc)
      val rightSide = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"),
          col("value"), col("event_id"))
        .withColumn("rn", row_number().over(rw)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts_s"), col("value"))
      Joins.asofLeftNative(leftSide, rightSide, "user_id", "ts_s", "ts_s",
          Seq("ts_s", "value"), "signup_")
        .select(col("event_id"), col("user_id"), col("ts_s"),
          col("signup_ts_s"), col("signup_value"))
        .orderBy(col("event_id"))
    },

    // FORWARD-STRICT ASOF through the same native operator: the reference
    // accepts all four inequalities in the ASOF ON clause (>=, >, <=, <);
    // `l.t < r.t` attaches the EARLIEST strictly-later right row — here,
    // the next signup event after each purchase. DuckDB's ASOF JOIN
    // supports the same four forms, so the oracle is exact.
    Q("q07c_asof_forward",
      """WITH r AS (
        |  SELECT user_id, ts_s, value FROM (
        |    SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_s, value,
        |           row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000000000 ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1),
        |l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s
        |  FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts_s,
        |       r.ts_s AS next_ts_s, r.value AS next_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_s < r.ts_s
        |ORDER BY l.event_id""") { (s, dir) =>
      val ev = Tables(s, dir).events
      val leftSide = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"))
      val rw = Window.partitionBy(col("user_id"), col("ts_s"))
        .orderBy(col("event_id").desc)
      val rightSide = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"),
          col("value"), col("event_id"))
        .withColumn("rn", row_number().over(rw)).filter(col("rn") === 1)
        .select(col("user_id"), col("ts_s"), col("value"))
      Joins.asofNativeMulti(leftSide, rightSide, Seq("user_id"), "ts_s", "ts_s",
          Seq("ts_s", "value"), "next_", leftOuter = true,
          forward = true, strict = true)
        .select(col("event_id"), col("user_id"), col("ts_s"),
          col("next_ts_s"), col("next_value"))
        .orderBy(col("event_id"))
    },

    // ASOF INNER over a MULTI-equi-key prefix (r13, promoted from
    // spec-only): ClickHouse's default ASOF strictness drops unmatched
    // left rows; the second key (a value bucket) is NOT functionally
    // dependent on the first, so a key-conflation bug cannot hide.
    // DuckDB's ASOF JOIN takes the same extra equality conditions.
    Q("q128_asof_inner_multikey",
      """WITH r AS (
        |  SELECT user_id, bucket, ts_s, value FROM (
        |    SELECT user_id, CAST(floor(value) AS BIGINT) % 3 AS bucket,
        |           epoch_ns(ts) // 1000000000 AS ts_s, value,
        |           row_number() OVER (PARTITION BY user_id, CAST(floor(value) AS BIGINT) % 3, epoch_ns(ts) // 1000000000
        |                              ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1),
        |l AS (
        |  SELECT event_id, user_id, CAST(floor(value) AS BIGINT) % 3 AS bucket,
        |         epoch_ns(ts) // 1000000000 AS ts_s
        |  FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.bucket, l.ts_s,
        |       r.ts_s AS sig_ts_s, r.value AS sig_value
        |FROM l ASOF JOIN r
        |  ON l.user_id = r.user_id AND l.bucket = r.bucket AND l.ts_s >= r.ts_s
        |ORDER BY l.event_id""") { (s, dir) =>
      val ev = Tables(s, dir).events
      val bucket = (floor(col("value")).cast("long") % 3).as("bucket")
      val leftSide = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), bucket,
          unix_timestamp(col("ts")).as("ts_s"))
      val rw = Window.partitionBy(col("user_id"), col("bucket"), col("ts_s"))
        .orderBy(col("event_id").desc)
      val rightSide = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), bucket,
          unix_timestamp(col("ts")).as("ts_s"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(rw)).filter(col("rn") === 1)
        .select(col("user_id"), col("bucket"), col("ts_s"), col("value"))
      Joins.asofNativeMulti(leftSide, rightSide, Seq("user_id", "bucket"),
          "ts_s", "ts_s", Seq("ts_s", "value"), "sig_", leftOuter = false)
        .select(col("event_id"), col("user_id"), col("bucket"), col("ts_s"),
          col("sig_ts_s"), col("sig_value"))
        .orderBy(col("event_id"))
    },

    // ---- 2.3 PASTE JOIN (lectures/lecture_10.md:15): positional zip of
    // two ranked lists.
    Q("q08_paste_join",
      """WITH a AS (SELECT c_name, c_acctbal, row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
        |           FROM customer QUALIFY rn <= 10),
        |b AS (SELECT s_name, s_acctbal, row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rn
        |      FROM supplier QUALIFY rn <= 10)
        |SELECT a.rn AS rank, a.c_name, a.c_acctbal, b.s_name, b.s_acctbal
        |FROM a JOIN b ON a.rn = b.rn
        |ORDER BY rank""") { (s, dir) =>
      val t = Tables(s, dir)
      // limit each side first so the positional window runs over 10 rows,
      // not the whole table (TakeOrderedAndProject does the heavy lifting)
      val topC = t.customer.select(col("c_name"), col("c_acctbal"), col("c_custkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc).limit(10)
      val topS = t.supplier.select(col("s_name"), col("s_acctbal"), col("s_suppkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey").asc).limit(10)
      Joins.paste(
          topC, Seq(col("c_acctbal").desc, col("c_custkey").asc),
          topS, Seq(col("s_acctbal").desc, col("s_suppkey").asc))
        .withColumnRenamed("paste_rn", "rank")
        .select(col("rank"), col("c_name"), col("c_acctbal"), col("s_name"), col("s_acctbal"))
        .orderBy(col("rank"))
    },

    // ---- 2.5 running sum window (homeworks/hw07.md:85-128)
    Q("q09_window_running_sum",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir).orders
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType).as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- 2.10 ReplacingMergeTree FINAL (lectures/lecture_07.md:551-677):
    // latest row per key via the reference's own row_number idiom.
    Q("q10_replacing_final",
      """SELECT user_id, event_id, event_type, value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        |ORDER BY user_id""") { (s, dir) =>
      FoldViews.replacingFinal(Tables(s, dir).events, Seq("user_id"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },

    // ---- 2.5 ORDER BY ... WITH FILL (lectures/lecture_20.md:216-241)
    Q("q11_with_fill",
      """WITH b AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n FROM orders GROUP BY 1),
        |axis AS (SELECT CAST(unnest(generate_series((SELECT MIN(d) FROM b), (SELECT MAX(d) FROM b), INTERVAL 1 DAY)) AS DATE) AS d)
        |SELECT axis.d, COALESCE(b.n, 0) AS n
        |FROM axis LEFT JOIN b USING (d)
        |ORDER BY d""") { (s, dir) =>
      val base = Tables(s, dir).orders
        .groupBy(col("o_orderdate").cast(DateType).as("d"))
        .agg(count(lit(1)).as("n"))
      WithFill.fillDates(base, "d", Seq("n" -> lit(0L))).orderBy(col("d"))
    },

    // ---- 2.4 WITH ROLLUP (lectures/lecture_06.md:72-77)
    Q("q12_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""") { (s, dir) =>
      // pre-aggregate before the ROLLUP Expand (3 copies per input row):
      // SUM/COUNT distribute, so the expansion runs over the ~6-row
      // (flag, status) table instead of the fact scan — identical values
      // (exact decimal sums at both levels, double cast at the end)
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec2(col("l_quantity"))).as("__s"), count(lit(1)).as("__n"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("__s")).cast(DoubleType).as("sum_qty"),
          sum(col("__n")).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // ---- 2.4 uniqExact (lectures/lecture_06.md:62)
    Q("q13_uniq_exact",
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, dir) =>
      Tables(s, dir).customer
        .groupBy(col("c_mktsegment"))
        .agg(uniqExact(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },

    // ---- 2.4 uniq ≈ approx distinct (homeworks/hw06.md:113-114).
    // HLL++ internals differ from DuckDB's sketch → rows-only check.
    Q.noOracle("q14_uniq_approx") { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(uniq(col("l_orderkey")).as("approx_orders"),
          uniqExact(col("l_orderkey")).as("exact_orders"))
        .orderBy(col("l_returnflag"))
    },

    // ---- 2.4 argMax (lectures/lecture_06.md:51): richest customer/nation.
    // Tie-broken by c_custkey via struct ordering (both engines compare
    // (acctbal, custkey) lexicographically).
    Q("q15_argmax",
      """SELECT c_nationkey, c_name AS richest_name, c_acctbal AS max_bal
        |FROM customer
        |QUALIFY row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey DESC) = 1
        |ORDER BY c_nationkey""") { (s, dir) =>
      // argMax with a (value, key) struct: lexicographic max ties-broken by
      // the highest custkey — mirrored in the oracle's ORDER BY ... DESC.
      Tables(s, dir).customer
        .groupBy(col("c_nationkey"))
        .agg(argMax(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("richest_name"),
          argMax(col("c_acctbal"), struct(col("c_acctbal"), col("c_custkey"))).as("max_bal"))
        .orderBy(col("c_nationkey"))
    },

    // ---- 2.4 -If combinators (lectures/lecture_07.md:509,521)
    Q("q16_agg_if",
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_heavy,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS discounted_price,
        |  MAX(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS max_qty_f
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          countIf(col("l_quantity") > 25).as("n_heavy"),
          sumIf(dec2(col("l_extendedprice")), col("l_discount") > 0.05)
            .cast(DoubleType).as("discounted_price"),
          maxIf(col("l_quantity"), col("l_linestatus") === "F").as("max_qty_f"))
        .orderBy(col("l_returnflag"))
    },

    // ---- 2.4 groupArray (homeworks/hw06.md:116-133), emitted as a joined
    // string so the comparison is order-insensitive on the wire.
    Q("q17_group_array",
      """SELECT n.n_name, string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""") { (s, dir) =>
      val t = Tables(s, dir)
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(arrayStringConcat(groupArraySorted(col("s_name")), ",").as("suppliers"))
        .orderBy(col("n_name"))
    },

    // ---- 2.8 arrayJoin / ARRAY JOIN (lectures/lecture_06.md:17-41)
    Q("q18_array_explode",
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
        |GROUP BY token ORDER BY token""") { (s, dir) =>
      Tables(s, dir).part
        .select(explode(split(col("p_type"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("token"))
    },

    // ---- 2.8 multiIf (lectures/lecture_06.md:12)
    Q("q19_multi_if",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'large' END AS band,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY band ORDER BY band""") { (s, dir) =>
      Tables(s, dir).orders
        .groupBy(multiIf(
          col("o_totalprice") < 50000, lit("small"),
          col("o_totalprice") < 150000, lit("mid"),
          lit("large")).as("band"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast(DoubleType).as("total"))
        .orderBy(col("band"))
    },

    // ---- 2.6 top-k (lectures/lecture_20.md:629-654) — Spark plans
    // TakeOrderedAndProject, the distributed heap-select.
    Q("q20_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""") { (s, dir) =>
      Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- 2.7 INTERSECT / EXCEPT (SURVEY §2.7)
    Q("q21_set_ops",
      """SELECT 'both' AS op, k FROM (
        |  (SELECT o_custkey AS k FROM orders)
        |  INTERSECT
        |  (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0))
        |UNION ALL
        |SELECT 'no_orders' AS op, k FROM (
        |  (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0)
        |  EXCEPT
        |  (SELECT o_custkey AS k FROM orders))
        |ORDER BY op, k""") { (s, dir) =>
      val t = Tables(s, dir)
      val withOrders = t.orders.select(col("o_custkey").as("k"))
      val positive = t.customer.filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("k"))
      withOrders.intersect(positive).select(lit("both").as("op"), col("k"))
        .unionByName(positive.except(withOrders)
          .select(lit("no_orders").as("op"), col("k")))
        .orderBy(col("op"), col("k"))
    },

    // ---- 2.1/2.7 ENGINE=Merge / merge() union with virtual _table column
    // (lectures/lecture_09.md:589-651)
    Q("q22_merge_union",
      """SELECT _table, COUNT(*) AS n, CAST(SUM(bal) AS DOUBLE) AS total_bal
        |FROM (SELECT 'customer' AS _table, CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer
        |      UNION ALL
        |      SELECT 'supplier' AS _table, CAST(s_acctbal AS DECIMAL(18,2)) AS bal FROM supplier)
        |GROUP BY _table ORDER BY _table""") { (s, dir) =>
      val t = Tables(s, dir)
      val c = t.customer.select(lit("customer").as("_table"), dec2(col("c_acctbal")).as("bal"))
      val su = t.supplier.select(lit("supplier").as("_table"), dec2(col("s_acctbal")).as("bal"))
      c.unionByName(su)
        .groupBy(col("_table"))
        .agg(count(lit(1)).as("n"), sum(col("bal")).cast(DoubleType).as("total_bal"))
        .orderBy(col("_table"))
    }
  )
}
