package graft.chsql

import graft.SparkSpec

/** Replays homeworks/hw08.md end-to-end — projections + MV over the
  * sales table — through ChSession SQL text: the verbatim DDL (column
  * comments, trailing comma), the verbatim randUniform/numbers insert,
  * ADD/MATERIALIZE PROJECTION (hw08.md:40-50), the TO-target MV +
  * backfill insert (hw08.md:52-86), and the projection-served group-by
  * (hw08.md:115-140). The data is randomized exactly as the homework's
  * (randUniform), so assertions check the INVARIANTS the capture
  * demonstrates: MV target == direct aggregation == projection-routed
  * aggregation, 1000 rows, 10 products.
  */
class Hw08ReplicationSpec extends SparkSpec {

  test("hw08: sales DDL + insert + projection + MV, all three read paths agree") {
    // parquet-backed: the transparent projection router keys on the
    // base table's scan path
    val dir = java.nio.file.Files.createTempDirectory("hw08").toString
    val s = new ChSession(spark, storageDir = Some(dir))
    // hw08.md:17-37 verbatim
    s.execute(
      """create table sales
        |(
        |    id         UInt32   comment 'уникальный идентификатор продажи',
        |    product_id UInt32   comment 'идентификатор продукта',
        |    quantity   UInt32   comment 'количество проданных единиц',
        |    price      Float32  comment 'цена за единицу',
        |    sale_date  DateTime comment 'дата продажи',
        |)
        |engine=MergeTree
        |order by id;
        |insert into sales
        |select
        |    number as id
        |    , floor(randUniform(1, 11)) as product_id
        |    , floor(randUniform(1, 5)) as quantity
        |    , round(randUniform(5.5, 10), 2) as price
        |    , toDate('2024-01-01') + interval (floor(id/100)) days as sale_date
        |from numbers(1, 1000);""".stripMargin)
    assert(s.sql("select count() as c from sales")
      .collect().head.getLong(0) == 1000L)
    // hw08.md:40-50 verbatim: the projection
    s.execute(
      """ALTER TABLE sales DROP PROJECTION IF EXISTS sales_product_agg_proj;
        |ALTER TABLE sales
        |    ADD PROJECTION sales_product_agg_proj
        |    (
        |        SELECT product_id, sum(quantity), sum(quantity * price)
        |        GROUP BY product_id
        |    )
        |;
        |ALTER TABLE sales MATERIALIZE PROJECTION sales_product_agg_proj;""".stripMargin)
    // hw08.md:55-86 verbatim: the SummingMergeTree target + MV + backfill
    s.execute(
      """create table sales_product_agg_tbl
        |(
        |    product_id UInt32,
        |    total_quantity UInt32,
        |    total_sales Float32
        |)
        |engine=SummingMergeTree()
        |order by product_id
        |;
        |drop table if exists sales_mv;
        |CREATE MATERIALIZED VIEW sales_mv TO sales_product_agg_tbl
        |as
        |select
        |    product_id
        |    , quantity as total_quantity
        |    , quantity * price as total_sales
        |from sales
        |;
        |insert into sales_product_agg_tbl
        |select
        |    product_id
        |    , quantity as total_quantity
        |    , quantity * price as total_sales
        |from sales
        |;""".stripMargin)
    // direct aggregation (what the projection serves, hw08.md:119-124)
    s.execute("set optimize_use_projections=1")
    val direct = s.sql(
      """SELECT product_id, sum(quantity) AS q, sum(quantity * price) AS t
        |from sales
        |GROUP BY product_id
        |order by product_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(direct.length == 10, s"10 products, got ${direct.length}")
    // MV-target read (hw08.md:91-101): one backfill insert, folded FINAL
    val mv = s.sql(
      """select product_id, sum(total_quantity) as q, sum(total_sales) as t
        |from sales_product_agg_tbl final
        |group by product_id order by product_id""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(mv.map(x => (x._1, x._2)).toSeq ==
      direct.map(x => (x._1, x._2)).toSeq,
      s"MV quantity totals must equal the direct aggregation\n" +
        s"mv=${mv.toSeq}\ndirect=${direct.toSeq}")
    mv.zip(direct).foreach { case ((_, _, a), (_, _, b)) =>
      // total_sales flows through Float32 in the MV target; the direct
      // path stays double — agree to float precision
      assert(math.abs(a - b) <= math.max(1e-2, b.abs * 1e-5),
        s"MV sales total drifted: $a vs $b")
    }
    // an MV keeps firing on NEW inserts (the homework's "automatically
    // updated" requirement): one more sale lands in the target
    s.execute(
      "insert into sales values (1001, 1, 2, 10.0, '2024-02-01 00:00:00')")
    val after = s.sql(
      """select sum(total_quantity) as q from sales_product_agg_tbl
        |where product_id = 1""".stripMargin).collect().head.getLong(0)
    val q1 = direct.find(_._1 == 1L).map(_._2).getOrElse(0L)
    assert(after == q1 + 2, s"MV must fire on insert: $after vs ${q1 + 2}")
  }
}
