package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic train/val/test assignment for dataset mixing — the split
  * step of a training-data pipeline.
  *
  * Assignment is a pure function of (salt, key): bucket = first 8 md5 hex
  * digits of "salt:key" modulo 10000, mapped through the cumulative split
  * weights. Three properties matter at 100 TB:
  *
  *  - '''map-side only''': a codegen'd expression per row, no shuffle, no
  *    sampling pass, no driver state;
  *  - '''stable under growth''': appending new documents never reassigns
  *    an existing one (no rand(), no row ordering dependence), so
  *    incremental corpus builds keep their eval sets frozen;
  *  - '''engine-portable''': md5 is md5 everywhere — any SQL engine can
  *    reproduce (and audit) the exact assignment.
  *
  * Changing `salt` draws an independent split.
  */
object DatasetSplit {

  /** Bucket in [0, 10000): `conv(substr(md5("salt:key"), 1, 8), 16, 10) %
    * 10000`.
    */
  def bucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8),
      16, 10).cast(LongType) % 10000

  /** Add `bucket` and `split` columns. `weights` are (label, fraction)
    * in assignment order; fractions must sum to 1 (±1e-9). Boundaries are
    * floor(cumFraction * 10000), so every bucket maps to exactly one
    * label.
    */
  def withSplit(
      df: DataFrame,
      key: Column,
      weights: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $weights")
    val b = bucket(key, salt)
    val bounds = weights.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c * 10000).toLong)
    // last boundary is 10000 by construction; fold the labels in reverse
    // so the FIRST label's test is outermost
    val split = weights.map(_._1).zip(bounds).init
      .foldRight(lit(weights.last._1): Column) { case ((label, hi), acc) =>
        when(b < hi, lit(label)).otherwise(acc)
      }
    df.withColumn("bucket", b).withColumn("split", split)
  }
}
