package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ORDER BY ... WITH FILL STEP n (lectures/lecture_20.md:29-33,
  * homeworks/hw14.md:35-51): densify a sparse axis by generating the
  * missing points and defaulting the value columns.
  *
  * Plan-only (no driver-side collect): the axis bounds come from a 1-row
  * aggregate that is cross-joined (broadcast, 1 row) into an
  * `explode(sequence(...))`, then left-joined back. At scale the join is a
  * broadcast of whichever side is small — normally the generated axis.
  */
object WithFill {

  /** Fill a date axis with one row per `step` days between min and max. */
  def fillDates(df: DataFrame, dateCol: String,
                defaults: Seq[(String, Column)], stepDays: Int = 1): DataFrame = {
    val axis = df
      .agg(min(col(dateCol)).as("__mn"), max(col(dateCol)).as("__mx"))
      .select(explode(sequence(col("__mn"), col("__mx"),
        expr(s"interval $stepDays day"))).as(dateCol))
    fillOnto(axis, df, dateCol, defaults)
  }

  /** Fill an integral axis (epoch seconds, buckets, ...) with `step`. */
  def fillLongs(df: DataFrame, axisCol: String,
                defaults: Seq[(String, Column)], step: Long = 1L): DataFrame = {
    val axis = df
      .agg(min(col(axisCol)).as("__mn"), max(col(axisCol)).as("__mx"))
      .select(explode(sequence(col("__mn"), col("__mx"), lit(step))).as(axisCol))
    fillOnto(axis, df, axisCol, defaults)
  }

  private def fillOnto(axis: DataFrame, df: DataFrame, axisCol: String,
                       defaults: Seq[(String, Column)]): DataFrame = {
    val joined = axis.join(df, Seq(axisCol), "left")
    defaults.foldLeft(joined) { case (acc, (name, default)) =>
      acc.withColumn(name, coalesce(col(name), default))
    }
  }
}
