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

  // plain or backtick-quoted segments, dot-qualified (`my col`.x is a
  // valid ClickHouse identifier; backtick content is lexer-protected so
  // any non-backtick characters are inert inside it)
  private val identRe =
    "([A-Za-z_][A-Za-z0-9_]*|`[^`]+`)(\\.([A-Za-z_][A-Za-z0-9_]*|`[^`]+`))*".r

  /** Parse-validates the TEXT FORM of an Array/Map/Tuple bound value
    * before it splices into the statement: balanced brackets, intact
    * single-quoted strings, and outside strings only literal syntax —
    * numbers, commas, colons, brackets, whitespace, NULL/true/false.
    * These values are reachable from the HTTP `param_x=` surface, so a
    * smuggled `); DROP TABLE t` must be rejected here, exactly as
    * ClickHouse validates parameter text forms.
    */
  private def validCollectionText(v: String): Boolean = {
    var i = 0; var inStr = false; var depth = 0
    val word = new StringBuilder
    def flushWord(): Boolean = {
      if (word.isEmpty) return true
      val w = word.result(); word.clear()
      w.toLowerCase match {
        case "null" | "true" | "false" | "nan" | "inf" => true
        case _ => w.matches("[+-]?[0-9][0-9_]*(\\.[0-9]*)?([eE][+-]?[0-9]+)?")
      }
    }
    while (i < v.length) {
      val c = v.charAt(i)
      if (inStr) {
        // ONLY the '' doubling escape — the same rule ChLexer.tokenize
        // applies downstream. Honoring backslash escapes here that the
        // lexer does NOT honor would let a value like ['a\', 1)] ...']
        // end its string earlier in the lexer than in this validator,
        // smuggling live tokens past the gate.
        if (c == '\'') {
          if (i + 1 < v.length && v.charAt(i + 1) == '\'') i += 1
          else inStr = false
        }
      } else c match {
        case '\'' => if (!flushWord()) return false; inStr = true
        case '[' | '(' | '{' => if (!flushWord()) return false; depth += 1
        case ']' | ')' | '}' =>
          if (!flushWord()) return false
          depth -= 1; if (depth < 0) return false
        case ',' | ':' => if (!flushWord()) return false
        case w if w.isWhitespace => if (!flushWord()) return false
        case d if d.isLetterOrDigit || d == '.' || d == '-' || d == '+' ||
          d == '_' => word += d
        case _ => return false
      }
      i += 1
    }
    !inStr && depth == 0 && flushWord()
  }

  /** A bound value as a SQL literal of the placeholder's declared type.
    * `Identifier` splices a validated name (it designates a table or
    * column — anything that is not an identifier is rejected, as
    * ClickHouse does); arrays, maps and tuples splice their text forms
    * after parse-validation; scalars go through an explicit CAST so
    * `{id:UInt8}` compares as a number, not a string.
    */
  private def renderLiteral(v: String, chType: String): String = {
    val lower = chType.toLowerCase
    if (lower == "identifier") {
      if (!identRe.pattern.matcher(v).matches())
        throw new IllegalArgumentException(
          s"Identifier parameter value '$v' is not a valid identifier")
      return v
    }
    if (lower.startsWith("array(") || lower.startsWith("map(") ||
      lower.startsWith("tuple(")) {
      if (!validCollectionText(v))
        throw new IllegalArgumentException(
          s"parameter value '$v' is not a valid $chType literal")
      return v
    }
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
