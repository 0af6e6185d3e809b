package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.chsql.ChSession
import graft.tables.Tables

/** The ClickHouse-SQL dialect layer (graft.chsql), driver-verified: each
  * query here is CLICKHOUSE SQL TEXT executed through [[ChSession]] —
  * PREWHERE, zero-arg count(), LIMIT BY, FINAL, Null-engine MV cascades —
  * with a plain-ANSI DuckDB oracle over the same parquet tables.
  */
object ChSqlQueries {

  private def withTable(ch: ChSession, name: String, ddlCols: String,
                        df: DataFrame, engine: String): Unit = {
    ch.execute(s"CREATE TABLE $name ($ddlCols) ENGINE = $engine")
    ch.ingest(name, df)
  }

  def all: Seq[Q] = Seq(

    // ---- PREWHERE + zero-arg count() + FORMAT tail, verbatim CH text
    Q("q96_chsql_prewhere",
      """SELECT c_mktsegment, count(*) AS n,
        |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
        |FROM customer WHERE c_acctbal > 0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "customer",
        "c_custkey Int64, c_mktsegment String, c_acctbal Float64",
        Tables(s, dir).customer
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
        "Memory")
      ch.sql(
        """SELECT c_mktsegment, count() AS n,
          |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
          |FROM customer PREWHERE c_acctbal > 0
          |GROUP BY c_mktsegment ORDER BY c_mktsegment
          |FORMAT JSONEachRow""".stripMargin)
    },

    // ---- LIMIT n BY key with a final LIMIT, order preserved (CH clause
    // order: ORDER BY → LIMIT BY → LIMIT)
    Q("q97_chsql_limit_by",
      """SELECT c_mktsegment, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t WHERE rn <= 3
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 9""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "customer",
        "c_custkey Int64, c_mktsegment String, c_acctbal Float64",
        Tables(s, dir).customer
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
        "Memory")
      ch.sql(
        """SELECT c_mktsegment, c_custkey, c_acctbal FROM customer
          |ORDER BY c_acctbal DESC, c_custkey
          |LIMIT 3 BY c_mktsegment LIMIT 9""".stripMargin)
    },

    // ---- ReplacingMergeTree FINAL through SQL text: a second inserted
    // part overrides every 10th order; FINAL folds parts by ORDER BY key
    // with the later part winning (money through DECIMAL for engine-
    // independent sums)
    Q("q98_chsql_replacing_final",
      """SELECT count(*) AS n, CAST(sum(CAST(
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders""") { (s, dir) =>
      val ch = new ChSession(s)
      val orders = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_totalprice"))
      ch.execute("CREATE TABLE ord (o_orderkey Int64, o_totalprice Float64) " +
        "ENGINE = ReplacingMergeTree ORDER BY o_orderkey")
      ch.ingest("ord", orders)
      ch.ingest("ord", orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice")))
      ch.sql(
        """SELECT count() AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM ord FINAL""".stripMargin)
    },

    // ---- CREATE DICTIONARY + dictGet through SQL text (the reference's
    // enrichment idiom, lecture_12): lowered to a correlated scalar
    // subquery that Catalyst rewrites into a join
    Q("q100_chsql_dictget",
      """SELECT n.n_name AS nation, r.r_name AS region
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY nation""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "nation", "n_nationkey Int64, n_name String, n_regionkey Int64",
        Tables(s, dir).nation
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey")), "Memory")
      withTable(ch, "region", "r_regionkey Int64, r_name String",
        Tables(s, dir).region.select(col("r_regionkey"), col("r_name")), "Memory")
      ch.execute(
        """CREATE DICTIONARY region_dict (r_regionkey Int64, r_name String)
          |PRIMARY KEY r_regionkey
          |SOURCE(CLICKHOUSE(TABLE 'region')) LAYOUT(HASHED()) LIFETIME(300)""".stripMargin)
      ch.sql(
        """SELECT n_name AS nation,
          |  dictGet('region_dict', 'r_name', n_regionkey) AS region
          |FROM nation ORDER BY nation""".stripMargin)
    },

    // ---- arrayJoin through SQL text (explode semantics vs unnest)
    Q("q101_chsql_arrayjoin",
      """SELECT n_name, unnest(string_split(n_name, 'A')) AS part
        |FROM nation ORDER BY n_name, part""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "nation", "n_nationkey Int64, n_name String",
        Tables(s, dir).nation.select(col("n_nationkey"), col("n_name")),
        "Memory")
      ch.sql(
        """SELECT n_name, arrayJoin(splitByChar('A', n_name)) AS part
          |FROM nation ORDER BY n_name, part""".stripMargin)
    },

    // ---- WITH FILL through SQL text: sparse integer axis densified with
    // zero-defaulted gap rows (the hw14 monitoring idiom)
    Q("q102_chsql_withfill",
      """WITH b AS (SELECT event_id AS t, count(*) AS n FROM events
        |  WHERE event_id % 7 = 0 AND event_id < 500 GROUP BY event_id),
        |g AS (SELECT unnest(range((SELECT min(t) FROM b),
        |                          (SELECT max(t) FROM b) + 1)) AS t)
        |SELECT g.t, CAST(coalesce(b.n, 0) AS BIGINT) AS n
        |FROM g LEFT JOIN b USING (t) ORDER BY t""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "ev", "event_id Int64",
        Tables(s, dir).events.select(col("event_id")), "Memory")
      ch.sql(
        """SELECT event_id AS t, count() AS n FROM ev
          |WHERE event_id % 7 = 0 AND event_id < 500
          |GROUP BY t ORDER BY t WITH FILL STEP 1""".stripMargin)
    },

    // ---- merge(db, regex) through SQL text: two catalog tables unioned
    // with the _table virtual column
    Q("q103_chsql_merge",
      """SELECT t._table, count(*) AS n, min(t.o_orderkey) AS min_k
        |FROM (
        |  SELECT 'orders_a' AS _table, o_orderkey FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT 'orders_b' AS _table, o_orderkey FROM orders WHERE o_orderkey % 2 = 1
        |) t GROUP BY t._table ORDER BY t._table""") { (s, dir) =>
      val ch = new ChSession(s)
      val orders = Tables(s, dir).orders.select(col("o_orderkey"))
      withTable(ch, "orders_a", "o_orderkey Int64",
        orders.filter(pmod(col("o_orderkey"), lit(2)) === 0), "Memory")
      withTable(ch, "orders_b", "o_orderkey Int64",
        orders.filter(pmod(col("o_orderkey"), lit(2)) === 1), "Memory")
      ch.sql(
        """SELECT _table, count() AS n, min(o_orderkey) AS min_k
          |FROM merge(default, '^orders_') GROUP BY _table ORDER BY _table""".stripMargin)
    },

    // ---- parameterized query through CH text: {name:Type} placeholders
    // bound from an explicit param map and from SET param_x session
    // bindings (the CLI --param_x / HTTP param_x= surface, lecture_03)
    Q("q104_chsql_params",
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer
        |WHERE c_acctbal > 1000.0 AND c_mktsegment <> 'MACHINERY'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "customer",
        "c_custkey Int64, c_mktsegment String, c_acctbal Float64",
        Tables(s, dir).customer
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
        "Memory")
      ch.execute("SET param_minbal = 1000.0")
      ch.sql(
        """SELECT c_mktsegment, count() AS n,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
          |FROM customer
          |WHERE c_acctbal > {minbal:Float64} AND c_mktsegment != {skip:String}
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
        Map("skip" -> "MACHINERY"))
    },

    // ---- inline INSERT ... FORMAT payload through CH text: a priority
    // weight table lands from literal CSVWithNames data, then weights an
    // orders aggregate (the client inline-data idiom, lecture_03)
    Q("q105_chsql_inline_insert",
      """WITH w(prio, weight) AS (VALUES ('1-URGENT', 4.0), ('2-HIGH', 2.0),
        |  ('3-MEDIUM', 1.0), ('4-NOT SPECIFIED', 0.5), ('5-LOW', 0.25))
        |SELECT o.o_orderpriority AS prio, count(*) AS n,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * ANY_VALUE(w.weight)
        |    AS DOUBLE) AS weighted
        |FROM orders o JOIN w ON w.prio = o.o_orderpriority
        |GROUP BY o.o_orderpriority ORDER BY prio""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "orders", "o_orderkey Int64, o_orderpriority String, " +
        "o_totalprice Float64",
        Tables(s, dir).orders
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
        "Memory")
      ch.execute(
        """CREATE TABLE prio_w (prio String, weight Float64) ENGINE = Memory;
          |INSERT INTO prio_w FORMAT CSVWithNames
          |prio,weight
          |1-URGENT,4.0
          |2-HIGH,2.0
          |3-MEDIUM,1.0
          |4-NOT SPECIFIED,0.5
          |5-LOW,0.25""".stripMargin)
      ch.sql(
        """SELECT o.o_orderpriority AS prio, count() AS n,
          |  CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    * any(w.weight) AS DOUBLE) AS weighted
          |FROM orders o JOIN prio_w w ON w.prio = o.o_orderpriority
          |GROUP BY o.o_orderpriority ORDER BY prio""".stripMargin)
    },

    // ---- PARTITION BY through CH text: orders partitioned by order
    // year; one partition DROPped (the reference's cheap bulk delete);
    // FINAL folds per partition. Oracle: the same aggregate with the
    // dropped year excluded.
    Q("q106_chsql_partitions",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE year(o_orderdate) <> 1994
        |GROUP BY yr ORDER BY yr""") { (s, dir) =>
      val ch = new ChSession(s)
      ch.execute(
        """CREATE TABLE ord (o_orderkey Int64, o_orderdate Date,
          |  o_totalprice Float64)
          |ENGINE = MergeTree ORDER BY o_orderkey
          |PARTITION BY toYear(o_orderdate)""".stripMargin)
      ch.ingest("ord", Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderdate").cast("date"),
          col("o_totalprice")))
      ch.execute("ALTER TABLE ord DROP PARTITION 1994")
      ch.sql(
        """SELECT CAST(toYear(o_orderdate) AS BIGINT) AS yr, count() AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM ord GROUP BY yr ORDER BY yr""".stripMargin)
    },

    // ---- projections through CH text (hw08): ADD + MATERIALIZE, then a
    // covered aggregate transparently routes to the pre-aggregate (the
    // Catalyst ProjectionRewrite rule — plan shape asserted in ChSqlSpec;
    // here the ROUTED values hash-match the oracle's full-scan aggregate).
    // Money summed as integer cents so the routed partial re-aggregation
    // is exact.
    Q("q107_chsql_projection",
      """SELECT o_orderpriority AS prio, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY prio ORDER BY prio""") { (s, dir) =>
      val store = java.nio.file.Files.createTempDirectory("graft_projq").toString
      val ch = new ChSession(s, Some(store))
      ch.execute(
        """CREATE TABLE ord (prio String, cents Int64)
          |ENGINE = MergeTree ORDER BY prio""".stripMargin)
      ch.ingest("ord", Tables(s, dir).orders.select(
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents")))
      ch.execute(
        """ALTER TABLE ord ADD PROJECTION by_prio (
          |  SELECT prio, count(), sum(cents) GROUP BY prio);
          |ALTER TABLE ord MATERIALIZE PROJECTION by_prio""".stripMargin)
      ch.sql(
        """SELECT prio, count() AS n, sum(cents) AS cents
          |FROM ord GROUP BY prio ORDER BY prio""".stripMargin)
    },

    // ---- Null-engine source firing an MV into a SummingMergeTree: three
    // ingested chunks land as three parts; FINAL folds them to the global
    // aggregate (the reference's ingest topology, lecture_13)
    Q("q99_chsql_mv_cascade",
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sv
        |FROM events GROUP BY event_type ORDER BY event_type""") { (s, dir) =>
      val ch = new ChSession(s)
      ch.execute(
        """CREATE TABLE ev_src (event_id Int64, event_type String, value Float64) ENGINE = Null;
          |CREATE TABLE ev_agg (event_type String, n Int64, sv Decimal(18, 3))
          |  ENGINE = SummingMergeTree ORDER BY event_type;
          |CREATE MATERIALIZED VIEW ev_mv TO ev_agg AS
          |  SELECT event_type, count() AS n,
          |    sum(CAST(value AS Decimal(18, 3))) AS sv
          |  FROM ev_src GROUP BY event_type;""".stripMargin)
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("event_type"), col("value"))
      (0 until 3).foreach(i =>
        ch.ingest("ev_src", ev.filter(pmod(col("event_id"), lit(3)) === i)))
      ch.sql(
        """SELECT event_type, n, CAST(sv AS DOUBLE) AS sv
          |FROM ev_agg FINAL ORDER BY event_type""".stripMargin)
        .select(col("event_type"), col("n"), col("sv"))
    },

    // ---- the -State/-Merge TEXT surface (lecture_07.md:495-546,
    // lecture_13.md:133-182): per-(flag, month) states inserted into an
    // AggregatingMergeTree via CH SQL, folded across parts with the
    // -Merge family on read. Exactness: avg states are fixed-point
    // cents (integral quantities → exact), sum/maxIf are exact by
    // construction; the approximate member of the family (uniq/HLL) is
    // oracled by its exact twin elsewhere (q13/q26b).
    Q("q108_chsql_state_merge",
      """SELECT l_returnflag AS flag,
        |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
        |    / 100.0 / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  MAX(CASE WHEN CAST(l_quantity AS BIGINT) % 2 = 0
        |      THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) END)
        |    AS max_even
        |FROM lineitem GROUP BY 1 ORDER BY 1""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "li",
        "flag String, ym Int64, qty Float64",
        Tables(s, dir).lineitem.select(col("l_returnflag").as("flag"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .cast("long").as("ym"),
          col("l_quantity").as("qty")),
        "Memory")
      ch.execute(
        """CREATE TABLE states (flag String, ym Int64,
          |  a AggregateFunction(avg, Float64),
          |  s AggregateFunction(sum, Int64),
          |  m AggregateFunction(maxIf, String, UInt8))
          |ENGINE = AggregatingMergeTree ORDER BY (flag, ym);
          |INSERT INTO states SELECT flag, ym,
          |  avgState(qty), sumState(qty),
          |  maxIfState(toString(CAST(qty AS BIGINT)),
          |             CAST(qty AS BIGINT) % 2 = 0)
          |FROM li GROUP BY flag, ym;""".stripMargin)
      ch.sql(
        """SELECT flag, avgMerge(a) AS avg_qty, sumMerge(s) AS sum_qty,
          |  maxIfMerge(m) AS max_even
          |FROM states GROUP BY flag ORDER BY flag""".stripMargin)
    },

    // ---- MergeTree virtual columns through TEXT: the lecture_07.md:
    // 581-609 manual-dedup idiom (row_number over _partition_id/_part
    // DESC) against a ReplacingMergeTree where a second part overrides
    // every 10th key — the same ground truth as q98's FINAL, reached
    // through the part-provenance columns instead of the engine fold.
    Q("q109_chsql_virtual_part_dedup",
      """SELECT count(*) AS n, CAST(sum(CAST(
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders""") { (s, dir) =>
      val ch = new ChSession(s)
      val orders = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_totalprice"))
      ch.execute("CREATE TABLE ordv (k Int64, price Float64) " +
        "ENGINE = ReplacingMergeTree ORDER BY k")
      ch.ingest("ordv", orders.toDF("k", "price"))
      ch.ingest("ordv", orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("p"))
        .toDF("k", "price"))
      ch.sql(
        """SELECT count(*) AS n, CAST(sum(CAST(price AS Decimal(18, 2)))
          |    AS DOUBLE) AS total
          |FROM (
          |  SELECT k, price, row_number() OVER (PARTITION BY k
          |    ORDER BY _partition_id DESC, _part DESC) AS lvl
          |  FROM ordv) t
          |WHERE t.lvl = 1""".stripMargin)
    },

    // ---- the HTTP interface end-to-end: the server loads orders, the
    // client GETs a parameterized aggregate with FORMAT JSONEachRow over
    // loopback (lecture_03.md:276-291 idioms: ?query=, param_x=, FORMAT
    // in text), and the response body parses back under a pinned schema.
    // What's verified is the full wire path — bind → rewrite → execute →
    // serialize → HTTP → parse — against a plain DuckDB aggregate.
    Q("q110_chsql_http",
      """SELECT o_orderpriority AS prio, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey % 5 = 0
        |GROUP BY o_orderpriority ORDER BY prio""") { (s, dir) =>
      val server = new graft.chsql.ChHttpServer(s)
      try {
        withTable(server.session, "orders",
          "o_orderkey Int64, o_orderpriority String, o_totalprice Float64",
          Tables(s, dir).orders.select(col("o_orderkey"),
            col("o_orderpriority"), col("o_totalprice")),
          "Memory")
        val q = java.net.URLEncoder.encode(
          """SELECT o_orderpriority AS prio, count() AS n,
            |  CAST(CAST(sum(CAST(o_totalprice AS Decimal(18,2))) AS DOUBLE)
            |    AS Float64) AS total
            |FROM orders WHERE o_orderkey % {mod:Int64} = 0
            |GROUP BY prio ORDER BY prio FORMAT JSONEachRow""".stripMargin,
          java.nio.charset.StandardCharsets.UTF_8)
        val resp = java.net.http.HttpClient.newHttpClient().send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"http://127.0.0.1:${server.port}/?param_mod=5&query=$q")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200, s"HTTP ${resp.statusCode()}: " +
          resp.body().take(200))
        import s.implicits._
        val lines = resp.body().linesIterator.filter(_.nonEmpty).toSeq
        s.read.schema("prio STRING, n BIGINT, total DOUBLE")
          .json(s.createDataset(lines))
          .orderBy("prio")
      } finally server.close()
    },

    // ---- r10 join_use_nulls=0 residue, driver-verified: UNQUALIFIED
    // unmatched-side references fill type defaults too (the r9 wrap was
    // alias-qualified-only; ownership now proven via the resolver)
    Q("q111_chsql_join_use_nulls_unqualified",
      """WITH o AS (SELECT o_custkey, COUNT(*) AS n_orders,
        |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |           FROM orders GROUP BY o_custkey)
        |SELECT c.c_custkey,
        |  COALESCE(o.n_orders, 0) AS n_orders,
        |  COALESCE(o.spend, 0.0) AS spend
        |FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
        |ORDER BY c.c_custkey""") { (s, dir) =>
      val ch = new ChSession(s)
      val t = Tables(s, dir)
      withTable(ch, "cust", "c_custkey Int64",
        t.customer.select(col("c_custkey")), "Memory")
      withTable(ch, "ostat", "o_custkey Int64, n_orders Int64, spend Float64",
        t.orders.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("spend")), "Memory")
      // n_orders / spend are UNQUALIFIED and owned by ostat alone
      ch.sql(
        """SELECT c.c_custkey, n_orders, spend
          |FROM cust c LEFT JOIN ostat o ON c.c_custkey = o.o_custkey
          |ORDER BY c.c_custkey""".stripMargin)
    },

    // ---- r10 fuzzer find, driver-verified: ANTI-join right columns
    // follow join_use_nulls — typed NULL under = 1 (type defaults under
    // the CH default = 0, the q05/hw06 path)
    Q("q112_chsql_anti_join_use_nulls",
      """SELECT c_custkey, CAST(NULL AS BIGINT) AS missing_order
        |FROM customer WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""") { (s, dir) =>
      val ch = new ChSession(s)
      val t = Tables(s, dir)
      withTable(ch, "cust", "c_custkey Int64",
        t.customer.select(col("c_custkey")), "Memory")
      // high-value orders only, so the anti set is NON-empty: customers
      // without one surface the typed-NULL right column
      withTable(ch, "ord", "o_custkey Int64, o_orderkey Int64",
        t.orders.filter(col("o_totalprice") > 300000)
          .select(col("o_custkey"), col("o_orderkey")), "Memory")
      ch.sql(
        """SELECT c.c_custkey, o.o_orderkey AS missing_order
          |FROM cust c LEFT ANTI JOIN ord o ON c.c_custkey = o.o_custkey
          |ORDER BY c.c_custkey
          |SETTINGS join_use_nulls = 1""".stripMargin)
    },

    // ---- r10 composite ANY RIGHT left side, driver-verified: the left
    // JOIN TREE (nation⋈region, EUROPE only) dedups per supplier nation
    // — tree keys are unique so ANY ≡ ALL and DuckDB oracles it exactly
    // — and unmatched suppliers fill the tree's String defaults
    Q("q113_chsql_any_right_composite",
      """SELECT COALESCE(t.n_name, '') AS n_name,
        |       COALESCE(t.r_name, '') AS r_name, s.s_suppkey
        |FROM supplier s LEFT JOIN (
        |  SELECT n.n_nationkey, n.n_name, r.r_name
        |  FROM nation n JOIN region r
        |    ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE') t
        |ON t.n_nationkey = s.s_nationkey
        |ORDER BY s.s_suppkey""") { (s, dir) =>
      val ch = new ChSession(s)
      val t = Tables(s, dir)
      withTable(ch, "nation", "n_nationkey Int64, n_name String, n_regionkey Int64",
        t.nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
        "Memory")
      withTable(ch, "region", "r_regionkey Int64, r_name String",
        t.region.select(col("r_regionkey"), col("r_name")), "Memory")
      withTable(ch, "supplier", "s_suppkey Int64, s_nationkey Int64",
        t.supplier.select(col("s_suppkey"), col("s_nationkey")), "Memory")
      ch.sql(
        """SELECT n.n_name, r.r_name, s.s_suppkey
          |FROM nation n JOIN region r
          |  ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
          |ANY RIGHT JOIN supplier s ON n.n_nationkey = s.s_nationkey
          |ORDER BY s.s_suppkey""".stripMargin)
    },

    // ---- r10 ASOF JOIN through SQL TEXT (q07 runs the library
    // operator; this is the dialect lowering — union-and-carry-forward,
    // one shuffle) vs DuckDB's native ASOF. Misses fill type defaults
    // (join_use_nulls = 0), so the oracle COALESCEs
    Q("q114_chsql_asof_join",
      """WITH r AS (
        |  SELECT user_id, ts_s, value FROM (
        |    SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_s, value,
        |           row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000000000 ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1),
        |l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s
        |  FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts_s,
        |       COALESCE(r.ts_s, 0) AS signup_ts_s,
        |       COALESCE(r.value, 0.0) AS signup_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_s >= r.ts_s
        |ORDER BY l.event_id""") { (s, dir) =>
      val ch = new ChSession(s)
      val ev = Tables(s, dir).events
      withTable(ch, "purch", "event_id Int64, user_id Int64, ts_s Int64",
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("ts_s")), "Memory")
      val rw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts_s")).orderBy(col("event_id").desc)
      withTable(ch, "signup", "user_id Int64, ts_s Int64, value Float64",
        ev.filter(col("event_type") === "signup")
          .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"),
            col("value"), col("event_id"))
          .withColumn("rn", row_number().over(rw)).filter(col("rn") === 1)
          .select(col("user_id"), col("ts_s"), col("value")), "Memory")
      ch.sql(
        """SELECT l.event_id AS event_id, l.user_id AS user_id,
          |  l.ts_s AS ts_s, r.ts_s AS signup_ts_s, r.value AS signup_value
          |FROM purch l ASOF LEFT JOIN signup r
          |  ON l.user_id = r.user_id AND l.ts_s >= r.ts_s
          |ORDER BY event_id""".stripMargin)
    },

    // ---- ALTER TABLE UPDATE + DELETE through SQL text (SURVEY §2.11,
    // lecture_16.md:173-199): the mutation pipeline read back vs a
    // DuckDB CASE/filter twin over the same parquet rows
    Q("q115_chsql_mutations",
      """SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus <> 'F'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      val ch = new ChSession(s)
      ch.execute("CREATE TABLE omut (o_orderkey Int64, o_orderstatus String, " +
        "o_totalprice Float64) ENGINE = MergeTree ORDER BY o_orderkey")
      ch.ingest("omut", Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")))
      ch.execute("ALTER TABLE omut UPDATE o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderkey % 10 = 0")
      ch.execute("ALTER TABLE omut DELETE WHERE o_orderstatus = 'F'")
      ch.sql(
        """SELECT o_orderstatus, count() AS n, CAST(sum(CAST(
          |    o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM omut GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // ---- table TTL through SQL text (SURVEY §2.10/§2.11, hw09.md:289-323
    // + hw11.md:197): MODIFY TTL + MATERIALIZE TTL expire rows vs a
    // DuckDB twin evaluating the SAME retention predicate against its
    // own now(). The year-start axis pins the boundary to Jan 1, so
    // both engines agree for any run inside the same calendar year.
    Q("q116_chsql_ttl",
      """SELECT count(*) AS n, min(o_orderdate) AS min_d,
        |  max(o_orderdate) AS max_d
        |FROM orders
        |WHERE date_trunc('year', o_orderdate) + INTERVAL 31 YEAR > now()""") { (s, dir) =>
      val ch = new ChSession(s)
      ch.execute("CREATE TABLE ottl (o_orderkey Int64, o_orderdate DateTime) " +
        "ENGINE = MergeTree ORDER BY o_orderkey")
      ch.ingest("ottl", Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderdate")))
      ch.execute(
        "ALTER TABLE ottl MODIFY TTL toStartOfYear(o_orderdate) + INTERVAL 31 YEAR")
      ch.execute("ALTER TABLE ottl MATERIALIZE TTL")
      ch.sql(
        """SELECT count() AS n, min(o_orderdate) AS min_d,
          |  max(o_orderdate) AS max_d FROM ottl""".stripMargin)
    },

    // ---- ASOF JOIN with SUBQUERY sides in SQL text (r11, the q114
    // sibling): both sides filter + project inline instead of being
    // pre-materialized tables — the lowering derives the column lists
    // from the subqueries' output schemas
    Q("q118_chsql_asof_subquery",
      """WITH r AS (
        |  SELECT user_id, ts_s, value FROM (
        |    SELECT user_id, epoch_ns(ts) // 1000000000 AS ts_s, value,
        |           row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000000000 ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'signup') WHERE rn = 1),
        |l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS ts_s
        |  FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts_s,
        |       COALESCE(r.ts_s, 0) AS signup_ts_s,
        |       COALESCE(r.value, 0.0) AS signup_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_s >= r.ts_s
        |ORDER BY l.event_id""") { (s, dir) =>
      val ch = new ChSession(s)
      ch.execute("CREATE TABLE ev (event_id Int64, user_id Int64, " +
        "ts DateTime, value Float64, event_type String) ENGINE = Memory")
      ch.ingest("ev", Tables(s, dir).events
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("event_type")))
      ch.sql(
        """SELECT l.event_id AS event_id, l.user_id AS user_id,
          |  l.ts_s AS ts_s, r.ts_s AS signup_ts_s, r.value AS signup_value
          |FROM (SELECT event_id, user_id, toUnixTimestamp(ts) AS ts_s
          |      FROM ev WHERE event_type = 'purchase') l
          |ASOF LEFT JOIN (
          |  SELECT user_id, ts_s, value FROM (
          |    SELECT user_id, toUnixTimestamp(ts) AS ts_s, value,
          |      row_number() OVER (PARTITION BY user_id, toUnixTimestamp(ts)
          |        ORDER BY event_id DESC) AS rn
          |    FROM ev WHERE event_type = 'signup') WHERE rn = 1) r
          |ON l.user_id = r.user_id AND l.ts_s >= r.ts_s
          |ORDER BY event_id""".stripMargin)
    },

    // ---- bare USING list followed by a comma-join (r12, advisor find):
    // `USING k, t3` keeps ONE join key and comma-joins t3 — pre-fix the
    // list scan swallowed t3 as a second key
    Q("q119_chsql_using_comma_join",
      """SELECT a.n_name AS nname, b.r_name AS rname, c.cid AS cid
        |FROM (SELECT n_regionkey AS k, n_name FROM nation) a
        |JOIN (SELECT r_regionkey AS k, r_name FROM region) b USING (k)
        |CROSS JOIN (SELECT r_regionkey AS cid FROM region) c
        |ORDER BY nname, cid""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "nat", "k Int64, n_name String",
        Tables(s, dir).nation
          .select(col("n_regionkey").as("k"), col("n_name")), "Memory")
      withTable(ch, "reg", "k Int64, r_name String",
        Tables(s, dir).region
          .select(col("r_regionkey").as("k"), col("r_name")), "Memory")
      withTable(ch, "reg2", "cid Int64",
        Tables(s, dir).region
          .select(col("r_regionkey").as("cid")), "Memory")
      ch.sql(
        """SELECT a.n_name AS nname, b.r_name AS rname, c2.cid AS cid
          |FROM nat a JOIN reg b USING k, reg2 c2
          |ORDER BY nname, cid""".stripMargin)
    },

    // ---- LEFT JOIN a subquery with COMPUTED columns under
    // join_use_nulls = 0 (r12): misses fill the RESULT-type defaults —
    // a count() reads 0, a concat reads '' — never a declared default
    // inherited by name coincidence
    Q("q120_chsql_subquery_computed_default",
      """SELECT c.c_custkey AS ck, COALESCE(o.cnt, 0) AS cnt,
        |       COALESCE(o.tag, '') AS tag
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, count(*) AS cnt,
        |         concat('c', CAST(o_custkey AS VARCHAR)) AS tag
        |  FROM orders GROUP BY o_custkey) o
        |ON c.c_custkey = o.o_custkey
        |ORDER BY ck""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "customer", "c_custkey Int64",
        Tables(s, dir).customer.select(col("c_custkey")), "Memory")
      withTable(ch, "orders", "o_custkey Int64",
        Tables(s, dir).orders.select(col("o_custkey")), "Memory")
      ch.sql(
        """SELECT c.c_custkey AS ck, o.cnt AS cnt, o.tag AS tag
          |FROM customer c LEFT JOIN (
          |  SELECT o_custkey, count() AS cnt,
          |    concat('c', toString(o_custkey)) AS tag
          |  FROM orders GROUP BY o_custkey) o
          |ON c.c_custkey = o.o_custkey
          |ORDER BY ck""".stripMargin)
    },

    // ---- a CTE SHADOWS a same-named catalog table (r12, advisor-find
    // follow-up): FROM resolves the CTE, not the catalog view — DuckDB's
    // CTE shadows its same-named parquet view identically
    Q("q121_chsql_cte_shadow",
      """WITH region AS (SELECT n_nationkey AS k, n_name AS nm
        |                FROM nation WHERE n_nationkey < 7)
        |SELECT k, nm FROM region ORDER BY k""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "region", "r_regionkey Int64, r_name String",
        Tables(s, dir).region
          .select(col("r_regionkey"), col("r_name")), "Memory")
      withTable(ch, "nation", "n_nationkey Int64, n_name String",
        Tables(s, dir).nation
          .select(col("n_nationkey"), col("n_name")), "Memory")
      ch.sql(
        """WITH region AS (SELECT n_nationkey AS k, n_name AS nm
          |                FROM nation WHERE n_nationkey < 7)
          |SELECT k, nm FROM region ORDER BY k""".stripMargin)
    },

    // ---- qualified star `g.*` subquery side under join_use_nulls = 0
    // (r13, advisor find: the star branch was dead under the old
    // lexing): the declared plain String fills '' on the miss, the
    // declared Nullable keeps NULL
    Q("q122_chsql_qualified_star_default",
      """SELECT r.r_name AS rname, COALESCE(n.n_name, '') AS nname,
        |       n.n_tag AS ntag
        |FROM region r LEFT JOIN
        |  (SELECT n_nationkey, n_name, n_name AS n_tag FROM nation
        |   WHERE n_nationkey < 2) n
        |ON r.r_regionkey = n.n_nationkey
        |ORDER BY rname""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "region", "r_regionkey Int64, r_name String",
        Tables(s, dir).region
          .select(col("r_regionkey"), col("r_name")), "Memory")
      withTable(ch, "nat",
        "n_nationkey Int64, n_name String, n_tag Nullable(String)",
        Tables(s, dir).nation
          .select(col("n_nationkey"), col("n_name"),
            col("n_name").as("n_tag")),
        "Memory")
      ch.sql(
        """SELECT r.r_name AS rname, n.n_name AS nname, n.n_tag AS ntag
          |FROM region r LEFT JOIN
          |  (SELECT g.* FROM nat g WHERE g.n_nationkey < 2) n
          |ON r.r_regionkey = n.n_nationkey
          |ORDER BY rname""".stripMargin)
    },

    // ---- bare `ARRAY JOIN col` (no AS, r13): the element REPLACES the
    // array column under its own name; WHERE filters the element
    Q("q123_chsql_bare_array_join",
      """SELECT n_regionkey AS rk, n_nationkey AS ks
        |FROM nation WHERE n_nationkey % 2 = 0
        |ORDER BY rk, ks""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "narr", "rk Int64, ks Array(Int64)",
        Tables(s, dir).nation.groupBy(col("n_regionkey").as("rk"))
          .agg(collect_list(col("n_nationkey")).as("ks")), "Memory")
      ch.sql(
        """SELECT rk, ks FROM narr ARRAY JOIN ks
          |WHERE ks % 2 = 0 ORDER BY rk, ks""".stripMargin)
    },

    // ---- multi-item ARRAY JOIN (r13): ClickHouse ZIPS the arrays —
    // positions align, no cartesian product (lecture_06's shoe-size
    // demo). Arrays are pure functions of the key so the zip is
    // deterministic against the oracle's lateral generate_series
    Q("q125_chsql_array_join_zip",
      """SELECT n.n_nationkey AS k, u.x AS x, u.x * 10 AS y
        |FROM (SELECT n_nationkey,
        |        range(1, n_nationkey % 3 + 2) AS xs FROM nation) n,
        |     UNNEST(n.xs) AS u(x)
        |ORDER BY k, x""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "narrz", "k Int64, xs Array(Int64), ys Array(Int64)",
        Tables(s, dir).nation.select(
          col("n_nationkey").as("k"),
          expr("sequence(1L, n_nationkey % 3 + 1)").as("xs"),
          expr("transform(sequence(1L, n_nationkey % 3 + 1), i -> i * 10)")
            .as("ys")), "Memory")
      ch.sql(
        """SELECT k, x, y FROM narrz ARRAY JOIN xs AS x, ys AS y
          |ORDER BY k, x""".stripMargin)
    },

    // ---- LEFT SEMI JOIN reading RIGHT columns (r13): ClickHouse
    // returns the first match's values — lowered to ANY INNER (dedup
    // right per key + inner join). The right payload is a pure function
    // of the key so the arbitrary pick is value-deterministic
    Q("q124_chsql_semi_right_read",
      """SELECT c.c_name AS cname, c.c_custkey * 2 AS t
        |FROM customer c
        |WHERE c.c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY cname""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "customer", "c_custkey Int64, c_name String",
        Tables(s, dir).customer
          .select(col("c_custkey"), col("c_name")), "Memory")
      withTable(ch, "orders", "o_custkey Int64",
        Tables(s, dir).orders.select(col("o_custkey")), "Memory")
      ch.sql(
        """SELECT c.c_name AS cname, o.t AS t
          |FROM customer c LEFT SEMI JOIN
          |  (SELECT o_custkey, o_custkey * 2 AS t FROM orders) o
          |ON c.c_custkey = o.o_custkey
          |ORDER BY cname""".stripMargin)
    },

    // ---- GROUP BY ... WITH TOTALS (r13): per-group rows + ONE grand-
    // total row (NULL keys — CH's separate totals block flattened), one
    // Expand+aggregate pass via GROUPING SETS ((k), ()); HAVING filters
    // only per-group rows (totals_mode = before_having spelling)
    Q("q126_chsql_with_totals",
      """SELECT o_orderstatus AS st,
        |  CAST(sum(cents) AS BIGINT) AS cents, count(*) AS n
        |FROM (SELECT o_orderstatus,
        |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders)
        |GROUP BY GROUPING SETS ((o_orderstatus), ())
        |HAVING GROUPING(o_orderstatus) = 1 OR count(*) > 100
        |ORDER BY (st IS NULL) DESC, st""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "orders", "o_orderstatus String, cents Int64",
        Tables(s, dir).orders.select(col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents")),
        "Memory")
      ch.sql(
        """SELECT o_orderstatus AS st, sum(cents) AS cents, count() AS n
          |FROM orders
          |GROUP BY o_orderstatus WITH TOTALS HAVING count() > 100
          |ORDER BY st IS NULL DESC, st""".stripMargin)
    },

    // ---- Enum8 columns (r13, promoted from spec-only): numeric
    // equality/IN comparisons map to the stored label while SELECT
    // returns the label (lecture_20.md:620's query_log idiom) — the
    // oracle spells the same predicate over the labels directly
    Q("q127_chsql_enum8",
      """SELECT o_orderstatus AS st, count(*) AS n FROM orders
        |WHERE o_orderstatus IN ('F', 'P')
        |GROUP BY st ORDER BY st""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "ost", "st Enum8('F' = 1, 'O' = 2, 'P' = 3)",
        Tables(s, dir).orders.select(col("o_orderstatus").as("st")),
        "Memory")
      ch.sql(
        """SELECT st, count() AS n FROM ost
          |WHERE st IN (1, 3) GROUP BY st ORDER BY st""".stripMargin)
    },

    // ---- ENGINE=Join + joinGet point lookups (r13, promoted from
    // spec-only): the Join-engine table is a broadcast-able lookup; a
    // miss returns NULL (the oracle's LEFT JOIN)
    Q("q129_chsql_joinget",
      """SELECT c.c_custkey AS ck, n.n_name AS nname
        |FROM customer c LEFT JOIN nation n
        |  ON c.c_nationkey = n.n_nationkey AND n.n_nationkey < 20
        |ORDER BY ck""") { (s, dir) =>
      val ch = new ChSession(s)
      ch.execute(
        "CREATE TABLE njoin (k Int64, v String) ENGINE = Join(ANY, LEFT, k)")
      ch.ingest("njoin", Tables(s, dir).nation
        .filter(col("n_nationkey") < 20)
        .select(col("n_nationkey").as("k"), col("n_name").as("v")))
      withTable(ch, "cust", "ck Int64, nk Int64",
        Tables(s, dir).customer
          .select(col("c_custkey").as("ck"), col("c_nationkey").as("nk")),
        "Memory")
      ch.sql(
        """SELECT ck, joinGet('njoin', 'v', nk) AS nname
          |FROM cust ORDER BY ck""".stripMargin)
    },

    // ---- chained CTEs (r13, the lecture_27.md:232-244 dbt shape): a
    // later CTE's body joins an EARLIER CTE, the final select reads the
    // last CTE with a bare star. Every real bug of r8-r12 lived one
    // composition level above the prior tests — this pins the
    // composition itself (CTE-in-CTE resolution through the defaults /
    // ANTI / probe passes). DuckDB runs the identical chained WITH.
    Q("q131_chsql_chained_cte",
      """WITH cases AS (
        |  SELECT o_orderkey AS rep, o_custkey AS ck FROM orders
        |  WHERE o_orderkey % 32 = 0
        |), countries AS (
        |  SELECT c_custkey AS code, c_name AS country FROM customer
        |), result AS (
        |  SELECT cases.rep AS report_id, countries.country AS country
        |  FROM cases JOIN countries ON cases.ck = countries.code
        |)
        |SELECT * FROM result ORDER BY report_id""") { (s, dir) =>
      val ch = new ChSession(s)
      withTable(ch, "orders", "o_orderkey Int64, o_custkey Int64",
        Tables(s, dir).orders.select(col("o_orderkey"), col("o_custkey")),
        "Memory")
      withTable(ch, "customer", "c_custkey Int64, c_name String",
        Tables(s, dir).customer.select(col("c_custkey"), col("c_name")),
        "Memory")
      ch.sql(
        """WITH cases AS (
          |  SELECT o_orderkey AS rep, o_custkey AS ck FROM orders
          |  WHERE o_orderkey % 32 = 0
          |), countries AS (
          |  SELECT c_custkey AS code, c_name AS country FROM customer
          |), result AS (
          |  SELECT cases.rep AS report_id, countries.country AS country
          |  FROM cases JOIN countries ON cases.ck = countries.code
          |)
          |SELECT * FROM result ORDER BY report_id""".stripMargin)
    },

    // ---- ENGINE=Set + `val IN SX` through text (r13, promoted from
    // spec-only; lecture_09.md:426-480): the Set table prefilters the
    // fact scan — the oracle spells the same membership as IN (subquery)
    Q("q132_chsql_in_set_table",
      """SELECT count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS sck
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_custkey % 5 = 0)""") { (s, dir) =>
      val ch = new ChSession(s)
      ch.execute("CREATE TABLE SX (k Int64) ENGINE = Set")
      ch.ingest("SX", Tables(s, dir).customer
        .filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("k")))
      withTable(ch, "ordv", "o_orderkey Int64, o_custkey Int64",
        Tables(s, dir).orders.select(col("o_orderkey"), col("o_custkey")),
        "Memory")
      ch.sql(
        """SELECT count() AS n, sum(o_custkey) AS sck FROM ordv
          |WHERE o_custkey IN SX""".stripMargin)
    }
  )
}
