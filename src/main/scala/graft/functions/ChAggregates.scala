package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ClickHouse aggregate-function surface (SURVEY.md §2.4) as Spark
  * aggregations. All of these compile to Spark's native partial+final
  * hash aggregation — i.e. map-side combine happens automatically, the
  * same way ClickHouse merges per-stream partial aggregation states
  * (lectures/lecture_21.md:158-169).
  */
object ChAggregates {

  /** uniq(x): approximate count-distinct (homeworks/hw06.md:113-114).
    * HLL++ under the hood, mergeable across partitions — the same sketch
    * family ClickHouse's uniq uses.
    */
  def uniq(c: Column, rsd: Double = 0.05): Column = approx_count_distinct(c, rsd)

  /** uniqExact(x) (lectures/lecture_06.md:62). */
  def uniqExact(c: Column): Column = countDistinct(c)

  /** argMax(a, b): value of a at the row where b is maximal
    * (lectures/lecture_06.md:51). Spark's max_by is the same operator.
    */
  def argMax(a: Column, b: Column): Column = max_by(a, b)
  def argMin(a: Column, b: Column): Column = min_by(a, b)

  // ---- -If combinators (lectures/lecture_07.md:509,521): agg over the
  // rows passing a predicate. `when` without otherwise yields NULL, which
  // every Spark aggregate skips — exactly ClickHouse's -If semantics.

  def sumIf(c: Column, cond: Column): Column = sum(when(cond, c))
  def countIf(cond: Column): Column = count(when(cond, lit(1)))
  def avgIf(c: Column, cond: Column): Column = avg(when(cond, c))
  def maxIf(c: Column, cond: Column): Column = max(when(cond, c))
  def minIf(c: Column, cond: Column): Column = min(when(cond, c))
  def argMaxIf(a: Column, b: Column, cond: Column): Column =
    max_by(when(cond, a), when(cond, b))

  /** groupArray(x) (homeworks/hw06.md:116-133). Order inside the array is
    * partition-arrival order (as in ClickHouse); pair with sort_array or
    * groupArraySorted for a deterministic result.
    */
  def groupArray(c: Column): Column = collect_list(c)
  def groupArraySorted(c: Column): Column = sort_array(collect_list(c))

  /** uniqArray / groupUniqArray (homeworks/hw14.md:54-70). */
  def groupUniqArray(c: Column): Column = collect_set(c)
  def uniqArraySorted(c: Column): Column = sort_array(collect_set(c))

  /** sumMap(m) (ClickHouse parametric aggregate, the SummingMergeTree
    * map-column fold): per group, sum map values key-wise and return
    * (sorted keys, matching sums) — CH's exact output shape. Composed
    * natively: explode → (group, key) partial-aggregated sum → per-group
    * sorted entry collect. Both shuffles key on full cardinality
    * (group × map key), so the work spreads at any scale.
    */
  def sumMap(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
             mapCol: Column): org.apache.spark.sql.DataFrame =
    foldMap(df, groupCols, mapCol, org.apache.spark.sql.functions.sum)

  /** minMap / maxMap (CH): key-wise min/max of map values per group, same
    * (sorted keys, values) output shape and same two full-cardinality
    * shuffles as [[sumMap]].
    */
  def minMap(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
             mapCol: Column): org.apache.spark.sql.DataFrame =
    foldMap(df, groupCols, mapCol, org.apache.spark.sql.functions.min)

  def maxMap(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
             mapCol: Column): org.apache.spark.sql.DataFrame =
    foldMap(df, groupCols, mapCol, org.apache.spark.sql.functions.max)

  private def foldMap(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
                      mapCol: Column, combine: Column => Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, sort_array, collect_list, struct}
    val g = groupCols.map(col)
    df.select(g :+ explode(mapCol).as(Seq("__k", "__v")): _*)
      .groupBy(g :+ col("__k"): _*)
      .agg(combine(col("__v")).as("__s"))
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("__k"), col("__s")))).as("__e"))
      .select(g :+ col("__e.__k").as("keys") :+ col("__e.__s").as("values"): _*)
  }

  /** GROUP BY ... WITH TOTALS (lectures/lecture_06.md): the per-group rows
    * plus one grand-total row (group columns null), computed in ONE pass as
    * GROUPING SETS ((cols...), ()) — Spark plans a single expand+aggregate,
    * not two scans.
    */
  def withTotals(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
                 aggs: Seq[Column]): org.apache.spark.sql.DataFrame = {
    val gcols = groupCols.map(org.apache.spark.sql.functions.col)
    df.groupingSets(Seq(gcols, Seq.empty), gcols: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
