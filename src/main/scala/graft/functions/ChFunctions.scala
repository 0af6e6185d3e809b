package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.NativeFunctions

/** ClickHouse-dialect scalar functions re-expressed as Spark `Column`
  * combinators (SURVEY.md §2.8). Everything here composes built-in,
  * codegen'd `org.apache.spark.sql.functions` — no UDFs — so the whole
  * surface stays inside whole-stage codegen and remains pushdown-friendly.
  *
  * Reference usages cited per function (file:line in /root/reference).
  */
object ChFunctions {

  // ---- conditional (lectures/lecture_06.md:12, lectures/lecture_21.md:108)

  /** multiIf(c1, v1, c2, v2, ..., default) — ClickHouse's flat CASE. */
  def multiIf(pairsThenDefault: Column*): Column = {
    require(pairsThenDefault.length % 2 == 1, "multiIf needs cond/value pairs + default")
    val default = pairsThenDefault.last
    val pairs = pairsThenDefault.dropRight(1).grouped(2).toSeq
    pairs.foldRight(default) { case (Seq(c, v), acc) => when(c, v).otherwise(acc) }
  }

  def ifFn(cond: Column, t: Column, f: Column): Column = when(cond, t).otherwise(f)
  def ifNull(c: Column, alt: Column): Column = coalesce(c, alt)
  def nullIf(a: Column, b: Column): Column = when(a === b, lit(null)).otherwise(a)

  // ---- date / time (lectures/lecture_07.md:178, homeworks/hw04.md:57-67)

  /** toYYYYMM(dt) → 202403 as Int (lectures/lecture_07.md:178). */
  def toYYYYMM(c: Column): Column = date_format(c, "yyyyMM").cast(IntegerType)

  /** toYYYYMMDD(dt) → 20240315 as Int (homeworks/hw11.md:34). */
  def toYYYYMMDD(c: Column): Column = date_format(c, "yyyyMMdd").cast(IntegerType)

  def toDateCh(c: Column): Column = c.cast(DateType)
  def toDateTimeCh(c: Column): Column = c.cast(TimestampType)

  /** toStartOfMonth (lectures/lecture_12.md:16). */
  def toStartOfMonth(c: Column): Column = date_trunc("month", c).cast(DateType)

  /** toStartOfWeek(dt, 1) = Monday-start week (lectures/lecture_06.md:13).
    * Spark's date_trunc("week") is Monday-start, matching mode=1.
    */
  def toStartOfWeek(c: Column): Column = date_trunc("week", c).cast(DateType)

  def toStartOfDay(c: Column): Column = date_trunc("day", c)
  def toStartOfHour(c: Column): Column = date_trunc("hour", c)

  /** toStartOfInterval(t, INTERVAL n SECOND) (lectures/lecture_20.md:216).
    * Floor the epoch to an n-second grid — stays codegen'd arithmetic.
    */
  def toStartOfInterval(c: Column, seconds: Long): Column =
    timestamp_seconds((unix_timestamp(c) / seconds).cast(LongType) * seconds)

  /** parseDateTimeBestEffort (lectures/lecture_21.md:105-107): lenient,
    * multi-format timestamp parse; OrZero variant yields epoch on failure.
    */
  def parseDateTimeBestEffort(c: Column): Column = coalesce(
    to_timestamp(c, "yyyy-MM-dd HH:mm:ss"),
    to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss"),
    to_timestamp(c, "yyyy-MM-dd"),
    to_timestamp(c, "dd/MM/yyyy HH:mm:ss"),
    to_timestamp(c, "yyyyMMddHHmmss"),
    to_timestamp(c))

  def parseDateTimeBestEffortOrZero(c: Column): Column =
    coalesce(parseDateTimeBestEffort(c), timestamp_seconds(lit(0)))

  // ---- math / rounding (homeworks/hw08.md:30-34, lectures/lecture_09.md:761)

  def intDiv(a: Column, b: Column): Column = (a / b).cast(LongType)
  def moduloCh(a: Column, b: Column): Column = pmod(a, b)
  def randUniform(a: Double, b: Double): Column = rand() * (b - a) + lit(a)

  // ---- string (lectures/lecture_09.md:326, lectures/lecture_03.md:306)

  /** formatReadableSize(bytes) → "1.00 MiB" (lectures/lecture_09.md:326).
    * Matches ClickHouse's binary-unit formatting with 2 decimals.
    */
  def formatReadableSize(c: Column): Column = {
    val units = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB")
    val b = c.cast(DoubleType)
    // build nested whens smallest-unit-first so the OUTERMOST test is the
    // largest unit; format_string (no thousands grouping), 2 decimals.
    // Pre-round with RoundHalfEvenExact so the format step is rounding-free:
    // Java's %.2f rounds the SHORTEST decimal repr half-up, while C-family
    // printf (the reference's output, and a DuckDB oracle) rounds the exact
    // binary value ties-to-even — they disagree on e.g. 1.005 and 2.675.
    units.zipWithIndex.tail.foldLeft(
      format_string("%.2f B", NativeFunctions.roundEven(b, 2)): Column) {
      case (acc, (u, i)) =>
      val scaled = NativeFunctions.roundEven(b / math.pow(1024.0, i.toDouble), 2)
      when(b >= math.pow(1024.0, i.toDouble),
        format_string(s"%.2f $u", scaled)).otherwise(acc)
    }
  }

  /** formatReadableQuantity(x) → "1.23 million" (decimal units: thousand /
    * million / billion / trillion, 2 decimals — ClickHouse's formatting).
    * Exact-value half-even pre-rounding, same reasoning as
    * [[formatReadableSize]].
    */
  def formatReadableQuantity(c: Column): Column = {
    val units = Seq("thousand", "million", "billion", "trillion")
    val x = c.cast(DoubleType)
    units.zipWithIndex.foldLeft(
      format_string("%.2f", NativeFunctions.roundEven(x, 2)): Column) {
      case (acc, (u, i)) =>
        val p = math.pow(1000.0, (i + 1).toDouble)
        when(x >= p,
          format_string(s"%.2f $u", NativeFunctions.roundEven(x / p, 2)))
          .otherwise(acc)
    }
  }

  def splitByChar(sep: String, c: Column): Column = split(c, java.util.regex.Pattern.quote(sep))
  def extractAllCh(c: Column, re: String): Column = regexp_extract_all(c, lit(re))
  def matchCh(c: Column, re: String): Column = c.rlike(re)

  // ---- JSON (clusters/ch_and_kafka/db/init.sql:59-62, homeworks/hw11.md:38-41)

  def jsonExtractString(c: Column, key: String): Column = get_json_object(c, s"$$.$key")
  def jsonExtractInt(c: Column, key: String): Column =
    get_json_object(c, s"$$.$key").cast(LongType)
  def jsonExtractFloat(c: Column, key: String): Column =
    get_json_object(c, s"$$.$key").cast(DoubleType)

  // ---- array / higher-order (lectures/lecture_06.md:14-41)

  def arrayStringConcat(c: Column, sep: String): Column = array_join(c, sep)
  /** groupArrayMovingSum(n)(x) / groupArrayMovingAvg(n)(x): CH returns
    * the per-group ARRAY of n-row moving aggregates in insertion order.
    * Spark spelling: a ROWS-frame window over the caller's explicit sort
    * key (MergeTree sort order pins CH's "insertion order" the same
    * way), one value per row — callers that want the CH array shape
    * `collect_list` over the same order.
    */
  def movingSum(x: Column, n: Int,
                w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(x).over(w.rowsBetween(-(n - 1L), 0L))

  def movingAvg(x: Column, n: Int,
                w: org.apache.spark.sql.expressions.WindowSpec): Column =
    avg(x).over(w.rowsBetween(-(n - 1L), 0L))

  def has(arr: Column, x: Column): Column = array_contains(arr, x)
  def arrayMapCh(arr: Column, f: Column => Column): Column = transform(arr, f)
  def arrayFilterCh(arr: Column, f: Column => Column): Column = filter(arr, f)
  def arrayEnumerate(arr: Column): Column =
    // sequence(1, 0) runs DESCENDING ([1, 0]); CH's enumerate of [] is []
    when(size(arr) > 0, sequence(lit(1), size(arr)))
      .otherwise(array().cast("array<int>"))

  // ---- type casts (lectures/lecture_07.md:519-522)

  def toUInt64(c: Column): Column = c.cast(LongType)
  def toInt64(c: Column): Column = c.cast(LongType)
  def toInt32(c: Column): Column = c.cast(IntegerType)
  def toInt8(c: Column): Column = c.cast(ByteType)
  def toFloat64(c: Column): Column = c.cast(DoubleType)
  def toStringCh(c: Column): Column = c.cast(StringType)

  /** Exact money arithmetic: cast a 2-decimal double column to decimal so
    * sums are associative/exact (oracle-stable at any parallelism — a
    * double sum's value depends on partitioning; a decimal sum's doesn't).
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
}
