package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dataset mixing and ordering for training-data pipelines: per-source
  * re-weighting (up/down-sampling into epochs) and the deterministic
  * global shuffle that fixes training order. Both are pure functions of
  * (salt, key) — append-stable, partitioning-independent, reproducible by
  * any engine with md5 (the [[DatasetSplit]] bucket contract).
  */
object DatasetMix {

  /** Re-weight sources into an epoch-expanded mixture: a row with weight
    * `w` appears `floor(w)` times (epochs 0..floor(w)-1) plus one more
    * epoch with probability `w - floor(w)`, decided by the md5 bucket of
    * `key#epoch` — so up- and down-sampling are the same mechanism
    * (weight 0.3 = keep 30% of rows, weight 2.5 = two full copies + a 50%
    * third). Weights are resolved driver-side into integer bucket
    * thresholds, so there is no float-rounding drift between engines.
    *
    * Map-side only: a bounded `sequence` explode (ceil(max weight) copies)
    * and a codegen'd hash filter — no shuffle, no sampling pass, no
    * driver state. Missing sources get `defaultWeight`.
    */
  def mixBySourceWeights(df: DataFrame, sourceCol: String, key: Column,
                         weights: Map[String, Double],
                         defaultWeight: Double = 1.0,
                         salt: String = ""): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0),
      "weights must be non-negative")
    def fullOf(w: Double): Long = math.floor(w).toLong
    def thrOf(w: Double): Long = math.round((w - math.floor(w)) * 10000)
    def resolve(f: Double => Long, dflt: Long): Column =
      weights.foldLeft(lit(dflt)) { case (acc, (s, w)) =>
        when(col(sourceCol) === s, lit(f(w))).otherwise(acc)
      }
    val full = resolve(fullOf, fullOf(defaultWeight))
    val thr = resolve(thrOf, thrOf(defaultWeight))
    val copies = full + when(thr > 0, lit(1L)).otherwise(lit(0L))
    // sequence(0, -1) would DESCEND, not empty out — drop weight-0 rows
    val epochs = when(copies > 0, sequence(lit(0L), copies - 1))
      .otherwise(array().cast("array<bigint>"))
    df.withColumn("__full", full).withColumn("__thr", thr)
      .withColumn("epoch", explode(epochs))
      .filter(col("epoch") < col("__full") ||
        DatasetSplit.bucket(
          concat(key.cast("string"), lit("#"), col("epoch")), salt)
          < col("__thr"))
      .drop("__full", "__thr")
  }

  /** Deterministic global shuffle: adds `shuffle_pos` — the row's 0-based
    * position in the corpus ordered by (md5(salt:key), key). This is the
    * training-order shuffle: seeded (change `salt` for a new epoch
    * order), append-stable in distribution, and reproducible by the
    * oracle as `row_number() OVER (ORDER BY md5(...), key) - 1`.
    *
    * The global rank is a two-phase distributed prefix count, not one
    * global window (which would funnel the corpus through a single
    * reducer — the [[Packing]] lesson): range-repartition on the hash,
    * count each partition, cumsum the O(#partitions) counts on the
    * driver, then a bounded within-partition row_number plus the
    * broadcast offsets.
    */
  def deterministicShuffle(df: DataFrame, key: Column, salt: String = "",
                           targetPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (targetPartitions > 0) targetPartitions
            else spark.sessionState.conf.numShufflePartitions
    // localCheckpoint pins partition assignment so phase 1's counts
    // describe exactly the partitions phase 2 windows over
    val parted = df
      .withColumn("__h", md5(concat(lit(salt + ":"), key.cast("string"))))
      .repartitionByRange(n, col("__h"), key)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = counts.keys.toSeq.sorted.map { p =>
      val o = acc; acc += counts(p); (p, o)
    }
    val offDf = spark.createDataFrame(offsets).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col("__h"), key)
    parted.join(broadcast(offDf), "__pid")
      .withColumn("shuffle_pos",
        (col("__off") + row_number().over(w).cast(LongType)) - 1L)
      .drop("__h", "__pid", "__off")
  }
}
