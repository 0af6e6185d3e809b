package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse `LIMIT n BY key` — the first n rows of each key group in
  * the query's sort order (SELECT ... ORDER BY o LIMIT n BY k): group-wise
  * truncation, distinct from LIMIT (global) and from GROUP BY (no
  * aggregation — whole rows pass through).
  *
  * Spark shape: `row_number` over (key, order). The shuffle hash-
  * partitions on the full key cardinality, so the work spreads across
  * reducers — this scales when keys are many (the common LIMIT BY use:
  * "top n per user"). For a handful of keys carrying the whole corpus,
  * use [[TopK.perGroup]] (O(n) partial-aggregated state per key) or
  * [[Sampling.stratifiedExactN]] instead — a window would funnel each
  * key's rows through one reducer.
  */
object LimitBy {

  /** First `n` rows per `keys` group ordered by `order` within the group.
    * Optional `offset` skips the first rows of each group (CH: `LIMIT
    * offset, n BY key`).
    */
  def limitBy(df: DataFrame, n: Int, keys: Seq[Column],
              order: Seq[Column], offset: Int = 0): DataFrame = {
    require(n > 0 && offset >= 0, s"need n > 0, offset >= 0; got $n, $offset")
    val rn = row_number().over(
      Window.partitionBy(keys: _*).orderBy(order: _*))
    df.withColumn("__rn", rn)
      .filter(col("__rn") > offset && col("__rn") <= offset + n)
      .drop("__rn")
  }
}
