package graft.mergetree

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** GraphiteMergeTree (lectures/lecture_07.md:793-818): age-dependent
  * time-series thinning — recent points kept fine-grained, older points
  * rolled up to coarser steps, per the retention config
  * `(age, precision)`.
  *
  * Realized as the scheduled window-agg job SURVEY §2.10 prescribes: each
  * row lands in the retention band implied by its age, its timestamp is
  * floored to that band's step, and values aggregate per
  * (series, bucket). One shuffle on (series, bucket).
  */
object GraphiteRollup {

  /** @param retentions (minAgeSeconds, stepSeconds), sorted by age
    *                   ascending; a row of age >= minAge uses that band's
    *                   step (the last matching band wins). Rows younger
    *                   than every band keep full precision (step 1).
    */
  def rollup(df: DataFrame, pathCol: String, timeCol: String, valueCol: String,
             now: Column, retentions: Seq[(Long, Long)],
             agg: Column => Column = avg): DataFrame = {
    val age = now.cast(LongType) - col(timeCol).cast(LongType)
    val step = retentions.sortBy(_._1).foldLeft(lit(1L): Column) {
      case (acc, (minAge, s)) => when(age >= minAge, lit(s)).otherwise(acc)
    }
    df.withColumn("__step", step)
      .withColumn("__bucket",
        (col(timeCol).cast(LongType) / col("__step")).cast(LongType) * col("__step"))
      .groupBy(col(pathCol), col("__bucket").as(timeCol))
      .agg(agg(col(valueCol)).as(valueCol), count(lit(1)).as("points_folded"))
  }
}
