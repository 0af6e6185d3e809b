package graft.chsql

import org.apache.spark.sql.types._

/** The ClickHouse parameterized-query surface: `{name:Type}` placeholders
  * bound from `--param_name` / HTTP `param_name=` / `SET param_name = v`
  * (lectures/lecture_03.md:265-307 exercises the HTTP form
  * `SELECT {id:UInt8}`). The HTTP endpoint itself is out of scope
  * (SURVEY §2.14); this reproduces the QUERY semantics: a placeholder is
  * a typed literal, substituted before parsing.
  *
  * Substitution is literal-aware: `{shard}`/`{replica}` macros and
  * `{}`-bearing format strings live inside single-quoted literals and are
  * never touched — only top-level `{name:Type}` forms are parameters.
  */
object ChParams {

  final case class Placeholder(name: String, chType: String)

  private val inner = "([A-Za-z_][A-Za-z0-9_]*)\\s*:\\s*([^{}]+)".r

  /** All `{name:Type}` placeholders outside string literals, in order. */
  def placeholders(stmt: String): Seq[Placeholder] = {
    val out = Seq.newBuilder[Placeholder]
    scan(stmt) { (body, _, _) =>
      body match {
        case inner(n, t) => out += Placeholder(n, t.trim)
        case _ => ()
      }
    }
    out.result()
  }

  /** Replaces each placeholder with a typed literal from `params`
    * (values are the raw text forms the CLI/HTTP surface passes).
    * Unknown placeholders fail loudly; a `{name}` without a type (an
    * unquoted DDL macro) is left alone.
    */
  def substitute(stmt: String, params: Map[String, String]): String = {
    val sb = new StringBuilder
    var last = 0
    scan(stmt) { (body, start, end) =>
      body match {
        case inner(n, t) =>
          val v = params.getOrElse(n,
            throw new IllegalArgumentException(
              s"query parameter '$n' (${t.trim}) has no bound value — " +
                s"SET param_$n = ... or pass params to sql()"))
          sb ++= stmt.substring(last, start)
          sb ++= renderLiteral(v, t.trim)
          last = end
        case _ => () // not a parameter form; leave verbatim
      }
    }
    sb ++= stmt.substring(last)
    sb.result()
  }

  /** Walks `{...}` groups outside single-quote/backtick literals; calls
    * `f(body, startOffset, endOffsetExclusive)` for each.
    */
  private def scan(s: String)(f: (String, Int, Int) => Unit): Unit = {
    var i = 0; var inStr = false; var inTick = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (inTick) { if (c == '`') inTick = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (c == '`') { inTick = true; i += 1 }
      else if (c == '{') {
        val close = s.indexOf('}', i + 1)
        if (close < 0) i += 1
        else { f(s.substring(i + 1, close), i, close + 1); i = close + 1 }
      } else i += 1
    }
  }

  /** A bound value as a SQL literal of the placeholder's declared type.
    * `Identifier` splices verbatim (it names a table/column); arrays,
    * maps and tuples splice verbatim too (their text forms are already
    * dialect expressions the rewriter lowers); scalars go through an
    * explicit CAST so `{id:UInt8}` compares as a number, not a string.
    */
  private def renderLiteral(v: String, chType: String): String = {
    val lower = chType.toLowerCase
    if (lower == "identifier") return v
    if (lower.startsWith("array(") || lower.startsWith("map(") ||
      lower.startsWith("tuple(")) return v
    val parsed = ChTypes.parse(chType)
    // `v` is the RAW value (CLI/HTTP pass it unquoted; SET unescapes
    // before storing) — escaping belongs to this quoting step alone, so
    // a value that genuinely starts/ends with an apostrophe survives
    val quoted = "'" + v.replace("'", "''") + "'"
    parsed.dataType match {
      case _: StringType => quoted
      case dt => s"CAST($quoted AS ${dt.sql})"
    }
  }
}
