package graft.chsql

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Wire-format round trips: serialize a DataFrame with
  * [[ChResultFormats.write]] (the HTTP / INTO OUTFILE side) and read it
  * back through the inline `INSERT … FORMAT <f>` payload path — the
  * same pairing a user exercises when they download a table over HTTP
  * and re-INSERT it. Every escape class rides along: tabs, newlines,
  * CRs, backslashes, single/double quotes, commas, the literal strings
  * `\N` and `\t`, unicode, empty-vs-NULL.
  *
  * This suite exists because the asymmetry was REAL before it: the TSV
  * serializer escaped `\t \n \r \\` ClickHouse-style but the reader
  * never unescaped them, and CSV wrote NULL as `""`, conflating it with
  * the empty string (ClickHouse writes `\N`).
  */
class ChFormatsRoundTripSpec extends SparkSpec {

  private def ch = new ChSession(spark)

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("s", StringType, nullable = false),
    StructField("ns", StringType, nullable = true),
    StructField("n", IntegerType, nullable = true)))

  private val nasty: Seq[(String, String)] = Seq(
    "plain" -> "x",
    "empty" -> "",
    "tab\tinside" -> "a\tb",
    "newline\ninside" -> "a\nb",
    "cr\rinside" -> "a\rb",
    "back\\slash" -> "\\",
    "quote'single" -> "it's",
    "dq\"double" -> "say \"hi\"",
    "comma,sep" -> ",,",
    "literal\\N" -> "\\N",
    "literal\\t" -> "\\t",
    "mix\\\tand\\n" -> "a\\\tb\\nc",
    "unicode héllo 世界" -> "’smart”",
    "trailing space " -> " leading")

  private def srcRows: Seq[Row] = nasty.zipWithIndex.map {
    case ((a, b), i) =>
      Row(i, a, if (i % 5 == 4) null else b, if (i % 3 == 2) null
      else Int.box(i * 7))
  }

  private def srcDf = spark.createDataFrame(
    new java.util.ArrayList[Row](scala.jdk.CollectionConverters
      .SeqHasAsJava(srcRows).asJava), schema)

  private def serialize(fmt: String): String = {
    val bos = new ByteArrayOutputStream()
    ChResultFormats.write(srcDf, fmt, bos)
    bos.toString("UTF-8")
  }

  private def normalize(rows: Array[Row]): Set[(Int, String, String, Any)] =
    rows.map(r => (r.getInt(0), r.getString(1),
      if (r.isNullAt(2)) "<NULL>" else r.getString(2),
      if (r.isNullAt(3)) null else r.getInt(3))).toSet

  private def roundTrip(fmt: String,
                        drop: ((String, String)) => Boolean = _ => false)
  : Unit = {
    val s = ch
    val tbl = "rt_" + fmt.toLowerCase
    s.execute(s"CREATE TABLE $tbl (id Int32, s String, " +
      "ns Nullable(String), n Nullable(Int32)) ENGINE = Memory")
    val keep = nasty.zipWithIndex.collect {
      case ((a, b), i) if !drop((a, b)) => i
    }.toSet
    val kept = srcRows.filter(r => keep(r.getInt(0)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(kept).asJava), schema)
    val bos = new ByteArrayOutputStream()
    ChResultFormats.write(df, fmt, bos)
    val payload = bos.toString("UTF-8")
    s.execute(s"INSERT INTO $tbl FORMAT $fmt\n$payload")
    val got = normalize(s.sql(s"SELECT id, s, ns, n FROM $tbl").collect())
    val want = normalize(df.collect())
    assert(got == want,
      s"$fmt round trip:\n  missing: ${want -- got}\n  extra: ${got -- want}")
  }

  test("TSV round-trips every escape class (tabs, newlines, CRs, " +
    "backslashes, literal \\N and \\t, unicode, empty-vs-NULL)") {
    roundTrip("TSV")
  }

  test("TSVWithNames round-trips with the header row") {
    roundTrip("TSVWithNames")
  }

  test("CSV round-trips quoting, commas, NULL-vs-empty AND quoted " +
    "embedded newlines (records re-join quote-aware; a bare CR is " +
    "excluded — the line framing folds it into \\n, documented delta)") {
    roundTrip("CSV", drop = { case (a, b) => (a + b).exists(_ == '\r') })
  }

  test("JSONEachRow round-trips everything (Catalyst JSON both ways)") {
    roundTrip("JSONEachRow")
  }

  test("Values round-trips SQL-literal escaping") {
    roundTrip("Values", drop = { case (a, b) =>
      // a raw CR inside a SQL literal does not survive the lexer's
      // line handling; CH's own Values parser has the same constraint
      (a + b).exists(_ == '\r') })
  }
}
