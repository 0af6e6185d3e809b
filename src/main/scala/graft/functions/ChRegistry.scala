package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** Registers ClickHouse-dialect function NAMES into the session's SQL
  * function registry, so `spark.sql("SELECT toYYYYMM(d), uniq(x) ...")`
  * written against the reference dialect runs unchanged
  * (lectures/lecture_07.md:178, homeworks/hw06.md:113).
  *
  * Every registration maps to a native Catalyst expression tree (never a
  * Scala UDF), so the dialect layer costs nothing at runtime: the plans
  * are identical to the Spark-native spelling and stay codegen'd.
  */
object ChRegistry {

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def f(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")

    // date/time
    f("toYYYYMM")(e => Cast(DateFormatClass(e.head, Literal("yyyyMM")), IntegerType))
    f("toYYYYMMDD")(e => Cast(DateFormatClass(e.head, Literal("yyyyMMdd")), IntegerType))
    f("toStartOfMonth")(e => Cast(TruncTimestamp(Literal("month"), e.head), DateType))
    f("toStartOfWeek")(e => Cast(TruncTimestamp(Literal("week"), e.head), DateType))
    f("toStartOfDay")(e => TruncTimestamp(Literal("day"), e.head))
    f("toStartOfHour")(e => TruncTimestamp(Literal("hour"), e.head))
    f("toDate")(e => Cast(e.head, DateType))
    f("toDateTime")(e => Cast(e.head, TimestampType))

    // casts
    f("toUInt64")(e => Cast(e.head, LongType))
    f("toInt64")(e => Cast(e.head, LongType))
    f("toUInt32")(e => Cast(e.head, LongType))
    f("toInt32")(e => Cast(e.head, IntegerType))
    f("toInt8")(e => Cast(e.head, ByteType))
    f("toFloat64")(e => Cast(e.head, DoubleType))
    f("toFloat32")(e => Cast(e.head, FloatType))
    f("toString")(e => Cast(e.head, StringType))

    // conditionals
    f("multiIf") { e =>
      val default = e.last
      val branches = e.dropRight(1).grouped(2).map { case Seq(c, v) => (c, v) }.toSeq
      CaseWhen(branches, Some(default))
    }
    f("if")(e => If(e(0), e(1), e(2)))
    f("ifNull")(e => Coalesce(e))

    // aggregates
    f("uniq")(e => new HyperLogLogPlusPlus(e.head))
    f("uniqExact")(e => Count(e).toAggregateExpression(isDistinct = true))
    f("argMax")(e => MaxBy(e(0), e(1)))
    f("argMin")(e => MinBy(e(0), e(1)))
    f("groupArray")(e => CollectList(e.head))
    f("groupUniqArray")(e => CollectSet(e.head))
    f("countIf")(e => Count(Seq(new NullIf(Literal(1), If(e.head, Literal(1), Literal(2))))))

    // misc scalar
    f("intDiv")(e => Cast(Divide(Cast(e(0), DoubleType), Cast(e(1), DoubleType)), LongType))
    f("modulo")(e => Pmod(e(0), e(1)))
    f("JSONExtractString")(e => jsonPath(e(0), e(1)))
    f("JSONExtractInt")(e => Cast(jsonPath(e(0), e(1)), LongType))
    f("JSONExtractFloat")(e => Cast(jsonPath(e(0), e(1)), DoubleType))
  }

  private def jsonPath(json: Expression, key: Expression): Expression = {
    val path = key match {
      case Literal(s, StringType) => Literal("$." + s.toString)
      case other => Concat(Seq(Literal("$."), other))
    }
    GetJsonObject(json, path)
  }
}
