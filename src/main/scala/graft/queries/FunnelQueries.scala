package graft.queries

import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.functions.Funnels

/** The reference's parametric sequence aggregates (SURVEY.md §2.4:
  * windowFunnel / retention / sequenceMatch / sequenceCount) over the
  * events table. Each aggregate buffers only the key's MATCHING events
  * and merges by concatenation, so map-side combine applies — no
  * window-per-key reducer shape.
  *
  * Oracle notes: windowFunnel's greedy chain scan provably equals the
  * exists-a-chain formulation in default mode (a later chain start only
  * widens the window), so the DuckDB oracle checks the EXISTS chains.
  * sequenceMatch '(?1)(?2)' over matching events is adjacency in the
  * (ts, cond-index)-sorted stream = a lag() check; sequenceCount of
  * '(?1).*(?2)' with NFA restart equals counting run boundaries
  * signup-run -> purchase-run in that stream.
  */
object FunnelQueries {

  private val evT = "epoch_ns(ts) // 1000000000"

  val all: Seq[Q] = Seq(

    // ---- windowFunnel(12h): view -> click -> purchase level per user
    Q("q54_window_funnel",
      s"""WITH e AS (SELECT user_id, $evT AS t, event_type FROM events),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id,
        |  CASE
        |   WHEN EXISTS (SELECT 1 FROM e e1, e e2, e e3
        |                WHERE e1.user_id=u.user_id AND e2.user_id=u.user_id AND e3.user_id=u.user_id
        |                  AND e1.event_type='view' AND e2.event_type='click' AND e3.event_type='purchase'
        |                  AND e2.t >= e1.t AND e3.t >= e2.t
        |                  AND e2.t <= e1.t + 43200 AND e3.t <= e1.t + 43200) THEN 3
        |   WHEN EXISTS (SELECT 1 FROM e e1, e e2
        |                WHERE e1.user_id=u.user_id AND e2.user_id=u.user_id
        |                  AND e1.event_type='view' AND e2.event_type='click'
        |                  AND e2.t >= e1.t AND e2.t <= e1.t + 43200) THEN 2
        |   WHEN EXISTS (SELECT 1 FROM e e1 WHERE e1.user_id=u.user_id AND e1.event_type='view') THEN 1
        |   ELSE 0 END AS lvl
        |FROM u ORDER BY user_id""") { (s, dir) =>
      Tables(s, dir).events.groupBy(col("user_id"))
        .agg(Funnels.windowFunnel(43200L, unix_timestamp(col("ts")), Seq(
          col("event_type") === "view",
          col("event_type") === "click",
          col("event_type") === "purchase")).as("lvl"))
        .orderBy(col("user_id"))
    },

    // ---- retention anchored on a week-1 high-value purchase
    Q("q55_retention",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |f AS (SELECT user_id,
        |        max(CASE WHEN ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS w1,
        |        max(CASE WHEN ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS w2,
        |        max(CASE WHEN ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-22' THEN 1 ELSE 0 END) AS w3
        |      FROM events WHERE event_type = 'purchase' AND value > 100
        |      GROUP BY user_id)
        |SELECT u.user_id,
        |  array_to_string([coalesce(w1, 0), least(coalesce(w1, 0), coalesce(w2, 0)),
        |   least(coalesce(w1, 0), coalesce(w3, 0))], ',') AS r
        |FROM u LEFT JOIN f ON f.user_id = u.user_id
        |ORDER BY u.user_id""") { (s, dir) =>
      val hv = col("event_type") === "purchase" && col("value") > 100
      def week(lo: String, hi: String) =
        hv && col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp")
      Tables(s, dir).events.groupBy(col("user_id"))
        .agg(Funnels.retention(Seq(
          week("2024-01-01", "2024-01-08"),
          week("2024-01-08", "2024-01-15"),
          week("2024-01-15", "2024-01-22"))).as("r0"))
        // driver compat: the comparator sorts rows in pandas, which cannot
        // sort ndarray cells — declare the retention array serialized
        .select(col("user_id"),
          concat_ws(",", col("r0").cast("array<string>")).as("r"))
        .orderBy(col("user_id"))
    },

    // ---- sequenceMatch '(?1)(?2)': a purchase as the IMMEDIATELY next
    // matching event after a signup (other event types are skipped;
    // an intervening signup re-arms, so only signup->purchase adjacency
    // in the filtered stream matches)
    Q("q56_sequence_match",
      s"""WITH f AS (
        |  SELECT user_id, typ,
        |         lag(typ) OVER (PARTITION BY user_id ORDER BY t, ord, typ) AS prev
        |  FROM (SELECT user_id, $evT AS t, event_type AS typ,
        |               CASE event_type WHEN 'signup' THEN 1 ELSE 2 END AS ord
        |        FROM events WHERE event_type IN ('signup', 'purchase'))),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        |  coalesce(bool_or(typ = 'purchase' AND prev = 'signup'), false) AS matched
        |FROM u LEFT JOIN f ON f.user_id = u.user_id
        |GROUP BY u.user_id ORDER BY u.user_id""") { (s, dir) =>
      Tables(s, dir).events.groupBy(col("user_id"))
        .agg(Funnels.sequenceMatch("(?1)(?2)", unix_timestamp(col("ts")), Seq(
          col("event_type") === "signup",
          col("event_type") === "purchase")).as("matched"))
        .orderBy(col("user_id"))
    },

    // ---- sequenceCount '(?1).*(?2)': non-overlapping signup->purchase
    // matches; the restart-after-match NFA counts exactly the
    // signup-run -> purchase-run boundaries of the sorted stream
    Q("q57_sequence_count",
      s"""WITH f AS (
        |  SELECT user_id, typ,
        |         lag(typ) OVER (PARTITION BY user_id ORDER BY t, ord, typ) AS prev
        |  FROM (SELECT user_id, $evT AS t, event_type AS typ,
        |               CASE event_type WHEN 'signup' THEN 1 ELSE 2 END AS ord
        |        FROM events WHERE event_type IN ('signup', 'purchase'))),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        |  CAST(coalesce(sum(CASE WHEN typ = 'purchase' AND prev = 'signup' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n
        |FROM u LEFT JOIN f ON f.user_id = u.user_id
        |GROUP BY u.user_id ORDER BY u.user_id""") { (s, dir) =>
      Tables(s, dir).events.groupBy(col("user_id"))
        .agg(Funnels.sequenceCount("(?1).*(?2)", unix_timestamp(col("ts")), Seq(
          col("event_type") === "signup",
          col("event_type") === "purchase")).as("n"))
        .orderBy(col("user_id"))
    },

    // ---- sequenceNextNode (CH, forward/first_match): per user, the
    // event right after the first consecutive view→click run in (ts,
    // event_id) order. One ordered window + a partition-min over the
    // same key — a single shuffle. NULL next_node (chain ends the
    // stream) is a real output value both engines agree on.
    Q("q83_sequence_next_node",
      """WITH o AS (SELECT user_id, event_type,
        |    row_number() OVER w AS rn,
        |    lead(event_type, 2) OVER w AS nxt,
        |    (event_type = 'view' AND lead(event_type, 1) OVER w = 'click') AS ok
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (SELECT user_id, rn, nxt,
        |    min(CASE WHEN ok THEN rn END) OVER (PARTITION BY user_id) AS rn0
        |  FROM o)
        |SELECT user_id, nxt AS next_node FROM f WHERE rn = rn0
        |ORDER BY user_id""") { (s, dir) =>
      Funnels.sequenceNextNode(Tables(s, dir).events, "user_id",
          Seq(col("ts"), col("event_id")), col("event_type"),
          Seq(col("event_type") === "view", col("event_type") === "click"))
        .orderBy(col("user_id"))
    }
  )
}
