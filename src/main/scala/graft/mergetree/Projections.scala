package graft.mergetree

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Projections (SURVEY.md §2.12; lectures/lecture_13.md:187-314,
  * homeworks/hw08.md): a pre-aggregated alternate copy of a table that
  * matching aggregate queries are routed to. The reference measured full
  * scan 0.073s vs projection 0.019s (homeworks/hw08.md:179,231) — the same
  * win here is reading a counts table instead of the fact table.
  *
  * The projection stores partial aggregates per group, so any query
  * grouping by a SUBSET of the projection's keys re-aggregates the
  * projection — the standard aggregate-rollup containment rule. Routing is
  * transparent via [[graft.plans.ProjectionRewrite]] (count/count-col/
  * sum/sum-expr/min/max/avg/hll-uniq), or explicit via
  * [[Projections.route]].
  */
/** @param sumExprs alias → SQL expression over base columns; materialized
  *                  as `__sum_<alias>` and routed for `sum(<that expr>)`
  *                  (the reference's own projection is
  *                  `sum(quantity * price)`, homeworks/hw08.md:40-48)
  * @param minCols / maxCols  re-aggregable extrema partial states
  * @param avgCols  stored as (sum, non-null count) pairs so avg
  *                 re-aggregates exactly
  * @param uniqCols stored as DataSketches HLL sketches (`hll_sketch_agg`)
  *                 — the uniqState projection of lectures/lecture_13.md;
  *                 sketch union is lossless, so routed
  *                 `hll_sketch_estimate(hll_sketch_agg(c))` queries return
  *                 EXACTLY the unrouted value
  * @param countCols per-column NON-NULL counts (`count(c)`, distinct from
  *                  the row count `count(*)` that every projection
  *                  stores); counts re-aggregate by summing
  */
final case class ProjectionDef(
    name: String,
    groupCols: Seq[String],
    sumCols: Seq[String],
    path: String,
    sumExprs: Map[String, String] = Map.empty,
    minCols: Seq[String] = Nil,
    maxCols: Seq[String] = Nil,
    avgCols: Seq[String] = Nil,
    uniqCols: Seq[String] = Nil,
    countCols: Seq[String] = Nil)

object Projections {

  /** ALTER TABLE ADD PROJECTION + MATERIALIZE PROJECTION: write the
    * pre-aggregate (count + per-column/per-expression partial states).
    */
  def materialize(base: DataFrame, p: ProjectionDef): Unit = {
    val aggs = (count(lit(1)).as("__cnt") +:
      p.sumCols.map(c => sum(col(c)).as(s"__sum_$c"))) ++
      p.sumExprs.toSeq.sortBy(_._1).map { case (alias, sql) =>
        sum(expr(sql)).as(s"__sum_$alias") } ++
      p.minCols.map(c => min(col(c)).as(s"__min_$c")) ++
      p.maxCols.map(c => max(col(c)).as(s"__max_$c")) ++
      p.avgCols.flatMap(c => Seq(
        sum(col(c)).as(s"__avgsum_$c"), count(col(c)).as(s"__avgcnt_$c"))) ++
      p.uniqCols.map(c => hll_sketch_agg(col(c)).as(s"__hll_$c")) ++
      p.countCols.map(c => count(col(c)).as(s"__nncnt_$c"))
    base.groupBy(p.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode(SaveMode.Overwrite).parquet(p.path)
  }

  /** Can `groupCols` be answered from projection `p`? (subset rule) */
  def covers(p: ProjectionDef, groupCols: Seq[String], sumCols: Seq[String]): Boolean =
    groupCols.forall(p.groupCols.contains) && sumCols.forall(p.sumCols.contains)

  /** Answer count/sum aggregates from the projection by re-aggregating its
    * partial states (exact: counts and sums are re-aggregable).
    */
  def route(spark: SparkSession, p: ProjectionDef, groupCols: Seq[String],
            sumCols: Seq[String]): DataFrame = {
    require(covers(p, groupCols, sumCols),
      s"projection ${p.name} does not cover ($groupCols, $sumCols)")
    val proj = spark.read.parquet(p.path)
    val aggs = sum(col("__cnt")).as("cnt") +:
      sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c"))
    proj.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
