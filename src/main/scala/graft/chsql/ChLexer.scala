package graft.chsql

/** Minimal SQL lexer for the ClickHouse dialect layer: splits a script
  * into statements and a statement into tokens, respecting
  * single-quoted strings ('' escape), backtick identifiers, `--` and
  * `/* */` comments. The rewriter works on this token stream — naive
  * regex rewrites would corrupt literals like 'FROM FINAL'.
  */
object ChLexer {

  final case class Token(text: String, isString: Boolean = false) {
    def upper: String = text.toUpperCase
    def is(s: String): Boolean = !isString && text.equalsIgnoreCase(s)
    def isIdent: Boolean = !isString && text.nonEmpty &&
      (Character.isLetter(text.charAt(0)) || text.charAt(0) == '_' ||
        text.charAt(0) == '`' ||
        // ClickHouse accepts digit-leading bare identifiers
        // (lectures/lecture_10.md:41 `CREATE TABLE 2billion`, `AS 2m`);
        // a digit-leading token that cannot be a numeric literal is one
        (Character.isDigit(text.charAt(0)) && !Token.numericish(text)))
  }

  object Token {
    // numeric literals (and exponent-head fragments like `5e`, which the
    // tokenizer splits off `5e-3`) — NOT identifiers
    private val numeric =
      "(?i)^(0x[0-9a-f]+|0b[01]+|\\d+(\\.\\d*)?(e[+-]?\\d+|e)?|\\.\\d+(e[+-]?\\d+|e)?)$".r
    private[ChLexer] def numericish(text: String): Boolean =
      numeric.findFirstIn(text).isDefined
  }

  /** Strips comments and splits on top-level semicolons. The client-style
    * `\G` terminator (vertical output) also ends a statement — the
    * lectures use it constantly, often with no following `;`.
    */
  def statements(script: String): Seq[String] = {
    val cleaned = cleanScript(script)
    ChTypes.splitTopLevel(cleaned, ';').flatMap(splitUnterminated)
      .map(_.trim).filter(_.nonEmpty)
  }

  /** Slides sometimes butt two statements together with no terminator
    * ("SELECT … GROUP BY id OPTIMIZE TABLE t", "… LIMIT 10 SELECT …").
    * SHOW, OPTIMIZE and ALTER can never appear MID-statement at paren
    * depth 0, so a conservative second pass splits before them. A
    * top-level SELECT inside a SELECT/WITH statement is legal only right
    * after a set-op keyword (UNION [ALL|DISTINCT] / EXCEPT / INTERSECT),
    * so any other bare SELECT is a butted second statement; inside
    * CREATE/INSERT statements (`… AS SELECT`, `INSERT INTO t SELECT`)
    * SELECT is legitimate and left alone.
    */
  private def splitUnterminated(stmt: String): Seq[String] = {
    var depth = 0; var inStr = false; var inTick = false; var inDq = false
    var i = 0
    var segStart = 0
    // SELECT-headed only: a WITH statement's MAIN SELECT legitimately
    // appears at top level after the CTE list (`WITH x AS (…) SELECT`,
    // `WITH 10 AS n SELECT n`), so WITH-headed segments are never cut
    def headIsSelect(from: Int): Boolean = {
      var j = from
      while (j < stmt.length && Character.isWhitespace(stmt.charAt(j))) j += 1
      stmt.regionMatches(true, j, "SELECT", 0, 6)
    }
    def prevWord(before: Int): String = {
      var j = before - 1
      while (j >= 0 && Character.isWhitespace(stmt.charAt(j))) j -= 1
      val end = j + 1
      while (j >= 0 && (Character.isLetterOrDigit(stmt.charAt(j)) ||
        stmt.charAt(j) == '_')) j -= 1
      stmt.substring(j + 1, end).toUpperCase
    }
    val setOps = Set("UNION", "ALL", "DISTINCT", "EXCEPT", "INTERSECT")
    val cuts = List.newBuilder[Int]
    while (i < stmt.length) {
      val c = stmt.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (inTick) { if (c == '`') inTick = false }
      else if (inDq) { if (c == '"' || c == '\n') inDq = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inTick = true
        case '"' => inDq = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && i > 0 && Character.isWhitespace(stmt.charAt(i - 1))) {
            def kwAt(kw: String): Boolean =
              stmt.regionMatches(true, i, kw, 0, kw.length) &&
                (i + kw.length >= stmt.length ||
                  Character.isWhitespace(stmt.charAt(i + kw.length)))
            // a cut keyword right after a continuation word is part of
            // the CURRENT statement, not a butted next one: `GRANT ALTER
            // ON ...` (privilege name), `SELECT * FROM show` (identifier
            // after FROM), `GRANT SELECT, ALTER ON` ("" = after a comma)
            def headWord: String = {
              var j = segStart
              while (j < stmt.length &&
                Character.isWhitespace(stmt.charAt(j))) j += 1
              val s0 = j
              while (j < stmt.length &&
                (Character.isLetterOrDigit(stmt.charAt(j)) ||
                  stmt.charAt(j) == '_')) j += 1
              stmt.substring(s0, j).toUpperCase
            }
            val continuation = Set("FROM", "JOIN", "TABLE", "INTO", "AS",
              "ON", "TO", "IN", "LIKE", "AND", "OR", "WHERE", "BY",
              "EXISTS", "DESCRIBE", "DESC", "ALL", "ANY")
            // an empty prevWord means punctuation precedes: a COMMA keeps
            // a privilege/projection list together, but a closed string
            // literal or paren does NOT suppress the cut
            def prevNonWs: Char = {
              var j = i - 1
              while (j >= 0 && Character.isWhitespace(stmt.charAt(j))) j -= 1
              if (j >= 0) stmt.charAt(j) else ' '
            }
            val pw = prevWord(i)
            val afterContinuation =
              continuation(pw) || (pw.isEmpty && prevNonWs == ',')
            val privilegeList = headWord == "GRANT" || headWord == "REVOKE"
            if ((kwAt("SHOW") || kwAt("OPTIMIZE") || kwAt("ALTER")) &&
              !afterContinuation && !privilegeList) {
              cuts += i; segStart = i
            } else if (kwAt("SELECT") && headIsSelect(segStart) &&
              !setOps(prevWord(i))) { cuts += i; segStart = i }
          }
      }
      i += 1
    }
    val idx = cuts.result()
    if (idx.isEmpty) Seq(stmt)
    else (0 :: idx).zip(idx :+ stmt.length)
      .map { case (a, b) => stmt.substring(a, b) }
  }

  /** One literal-aware pass over the raw script: strips comments,
    * normalizes slide-deck smart quotes (‘2024-01-01’ → '2024-01-01'),
    * and turns the client-style `\G` terminator into `;` — all WITHOUT
    * touching the inside of single-quoted string literals, so a literal
    * 'C:\Games' or 'don’t' survives intact.
    *
    * Inline `INSERT … FORMAT <fmt>` payloads are DATA, not SQL: once a
    * statement headed INSERT reaches `FORMAT <name>`, everything up to
    * the statement's top-level `;` copies VERBATIM — no comment
    * stripping, no smart-quote normalization, no `\G` — so a raw TSV
    * field `a--b` or `don’t` survives the trip into
    * [[ChSession]]'s payload carve. The terminator search inside the
    * payload honors the same quote/paren rules as the statement
    * splitter, so `{"msg": "a;b"}` and `(1, 'a;b')` stay one payload.
    */
  def cleanScript(s: String): String = {
    val out = new StringBuilder
    var i = 0
    var strCloser: Char = 0 // 0 = not in a string; else the expected closer
    var inTick = false
    // inline-payload detection: first word of the statement + the word
    // being scanned (both only grown OUTSIDE literals/ticks)
    var head = ""
    var word = new StringBuilder
    var afterFormatKw = false
    // an INSERT that has entered a SELECT/WITH/VALUES body carries NO
    // inline payload — a column named `format` inside INSERT…SELECT must
    // not flip the rest of the script into verbatim copy
    var inQueryBody = false
    // inline FORMAT appears only at the statement's TOP level: a column
    // named `format` inside the INSERT's column list (paren depth > 0)
    // must not arm the trigger either
    var parenDepth = 0
    // ends the current word; true ⟹ it was an inline format name and
    // the payload was copied verbatim (i already advanced past it)
    def endWord(): Boolean = {
      if (word.isEmpty) false
      else {
        val w = word.result(); word = new StringBuilder
        if (afterFormatKw) {
          afterFormatKw = false
          head = ""
          inQueryBody = false
          parenDepth = 0
          i = copyRawPayload(s, i, out)
          true
        } else {
          if (head.isEmpty) head = w.toUpperCase
          else if (w.equalsIgnoreCase("SELECT") ||
            w.equalsIgnoreCase("WITH") || w.equalsIgnoreCase("VALUES"))
            inQueryBody = true
          else if (w.equalsIgnoreCase("FORMAT") && head == "INSERT" &&
            !inQueryBody && parenDepth == 0)
            afterFormatKw = true
          false
        }
      }
    }
    while (i < s.length) {
      val c = s.charAt(i)
      var consumed = false
      if (strCloser == 0 && !inTick) {
        if (Character.isLetterOrDigit(c) || c == '_') word += c
        else {
          consumed = endWord()
          if (!consumed) {
            if (c == ';') {
              head = ""; afterFormatKw = false; inQueryBody = false
              parenDepth = 0
            } else if (c == '(') parenDepth += 1
            else if (c == ')') parenDepth = math.max(0, parenDepth - 1)
          }
        }
      }
      if (consumed) () // payload copied; re-read from the new position
      else if (strCloser != 0) {
        if (c == strCloser) {
          // '' escape only applies to plain-quoted strings
          if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
            out ++= "''"; i += 2
          } else {
            out += (if (strCloser == '"' || strCloser == '”') '"' else '\'')
            strCloser = 0; i += 1
          }
        } else if (c == '\n' && (strCloser == '"' || strCloser == '”')) {
          // identifiers / JSON strings never span raw newlines — bail so
          // an unbalanced '"' can't disable comment stripping for the
          // rest of the script (single-quoted literals MAY be multiline)
          strCloser = 0; out += c; i += 1
        } else if (c == '\'' && strCloser == '’') {
          // the smart delimiters become plain quotes, so an interior
          // plain quote must leave as the '' escape or it would close
          // the emitted literal early (‘l'été’ → 'l''été')
          out ++= "''"; i += 1
        } else if (c == '"' && strCloser == '”') {
          out ++= "\"\""; i += 1
        } else { out += c; i += 1 }
      } else if (inTick) {
        out += c
        if (c == '`') inTick = false
        i += 1
      } else if (c == '\'') { strCloser = '\''; out += '\''; i += 1 }
      // double-quoted regions (SQL identifiers; JSON payload strings in
      // inline INSERT ... FORMAT data) are literal-protected too
      else if (c == '"') { strCloser = '"'; out += '"'; i += 1 }
      // slide decks open literals with ‘ or even a bare ’ — both close on ’
      else if (c == '‘' || c == '’') { strCloser = '’'; out += '\''; i += 1 }
      // smart double quotes open a protected region like plain ones —
      // “a -- b” must not lose its body to the comment stripper. Only
      // '“' OPENS the region: a bare '”' in pasted prose is just
      // normalized to '"', not allowed to swallow the rest of the line
      else if (c == '“') { strCloser = '”'; out += '"'; i += 1 }
      else if (c == '”') { out += '"'; i += 1 }
      else if (c == '`') { inTick = true; out += c; i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < s.length && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i += 2
      } else if (c == '\\' && i + 1 < s.length && s.charAt(i + 1) == 'G') {
        out += ';'; i += 2
      } else { out += c; i += 1 }
    }
    endWord()
    out.result()
  }

  /** Copies an inline INSERT payload verbatim from `start` up to (not
    * including) its terminating top-level `;`, honoring the statement
    * splitter's quote/paren protections so a `;` inside a JSON string,
    * a quoted Values literal or a parenthesized tuple stays data.
    * Returns the index of the terminator (or end of input).
    */
  private def copyRawPayload(s: String, start: Int,
                             out: StringBuilder): Int = {
    var i = start
    var depth = 0
    var inStr = false
    var inDq = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        out += c
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            out += '\''; i += 1
          } else inStr = false
        }
        i += 1
      } else if (inDq) {
        out += c
        if (c == '\\' && i + 1 < s.length) { out += s.charAt(i + 1); i += 1 }
        else if (c == '"' || c == '\n') inDq = false
        i += 1
      } else if (c == ';' && depth == 0) return i
      else {
        out += c
        c match {
          case '\'' => inStr = true
          case '"' => inDq = true
          case '(' | '[' => depth += 1
          // clamp at 0: a stray ')' in the data (or a mis-armed trigger)
          // must not push depth negative and disable the ';' terminator
          case ')' | ']' => if (depth > 0) depth -= 1
          case _ => ()
        }
        i += 1
      }
    }
    i
  }

  private val punct = Set('(', ')', ',', ';', '[', ']')

  /** Tokenizes a comment-free statement. Operators are kept as single
    * tokens where the rewriter cares (`\\G` tails, `==`); identifiers
    * keep qualified dots (`db.table`, `system.parts`) as ONE token so
    * catalog rewriting is a token map.
    */
  def tokenize(sqlRaw: String): Vector[Token] = {
    val sql = sqlRaw
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (c == '\'' || c == '‘' || c == '’') {
        // ‘…’ (or ’…’) = slide-deck smart quoting; normalize the
        // DELIMITERS to plain quotes but keep the literal body verbatim
        val closer = if (c == '\'') '\'' else '’'
        val sb = new StringBuilder("'")
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = sql.charAt(i)
          if (ch == '\\' && closer == '\'' && i + 1 < n &&
            (sql.charAt(i + 1) == '\'' || sql.charAt(i + 1) == '\\')) {
            // ClickHouse backslash escapes (hw14.md:46's \' inside the
            // dashboard INSERT) — normalize \' to the doubled-quote
            // spelling so the rendered literal means the same to Spark
            sb ++= (if (sql.charAt(i + 1) == '\'') "''" else "\\\\")
            i += 1 // the loop tail advances past the second char
          } else if (ch == closer) {
            if (closer == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') {
              sb ++= "''"; i += 1
            } else { sb += '\''; done = true }
          } else sb += ch
          i += 1
        }
        if (!done) sb += '\'' // unterminated literal: close it
        out += Token(sb.result(), isString = true)
      } else if (c == '“' || c == '”') { out += Token("\""); i += 1 }
      else if (c == '`') {
        val j = sql.indexOf('`', i + 1)
        val end = if (j < 0) n - 1 else j
        // qualified `db`.`table` — keep gluing dots below
        var text = sql.substring(i, end + 1)
        i = end + 1
        while (i < n && sql.charAt(i) == '.' &&
          !(i + 1 < n && sql.charAt(i + 1) == '*')) {
          val rest = readIdentPart(sql, i + 1)
          text += "." + rest
          i += 1 + rest.length
        }
        // qualified star `` `t`.* `` — ONE token, so select-item passes
        // can recognize the star form (pre-fix it lexed as an operator
        // run `.*` and the qualified-star branch was dead, r12 advisor)
        if (i + 1 < n && sql.charAt(i) == '.' && sql.charAt(i + 1) == '*') {
          text += ".*"; i += 2
        }
        out += Token(text)
      } else if (Character.isLetter(c) || c == '_') {
        var j = i
        while (j < n && (Character.isLetterOrDigit(sql.charAt(j)) ||
          sql.charAt(j) == '_')) j += 1
        var text = sql.substring(i, j)
        i = j
        // glue qualified names into one token: db.table, a.b.c
        while (i < n && sql.charAt(i) == '.' && i + 1 < n &&
          (Character.isLetter(sql.charAt(i + 1)) || sql.charAt(i + 1) == '_' ||
            sql.charAt(i + 1) == '`')) {
          val rest = readIdentPart(sql, i + 1)
          text += "." + rest
          i += 1 + rest.length
        }
        // qualified star `t.*` / `db.t.*` — glued into the identifier
        // token (see the backtick branch above)
        if (i + 1 < n && sql.charAt(i) == '.' && sql.charAt(i + 1) == '*') {
          text += ".*"; i += 2
        }
        out += Token(text)
      } else if (Character.isDigit(c)) {
        var j = i
        while (j < n && (Character.isLetterOrDigit(sql.charAt(j)) ||
          sql.charAt(j) == '.')) j += 1
        out += Token(sql.substring(i, j))
        i = j
      } else if (punct(c)) { out += Token(c.toString); i += 1 }
      else {
        // operator run: ==, <=, >=, !=, ||, ->, \G
        var j = i + 1
        while (j < n && !Character.isLetterOrDigit(sql.charAt(j)) &&
          !Character.isWhitespace(sql.charAt(j)) && !punct(sql.charAt(j)) &&
          sql.charAt(j) != '\'' && sql.charAt(j) != '`' &&
          sql.charAt(j) != '_') j += 1
        out += Token(sql.substring(i, j))
        i = j
      }
    }
    out.result()
  }

  private def readIdentPart(sql: String, start: Int): String = {
    if (start < sql.length && sql.charAt(start) == '`') {
      val j = sql.indexOf('`', start + 1)
      sql.substring(start, if (j < 0) sql.length else j + 1)
    } else {
      var j = start
      while (j < sql.length && (Character.isLetterOrDigit(sql.charAt(j)) ||
        sql.charAt(j) == '_')) j += 1
      sql.substring(start, j)
    }
  }

  /** Renders tokens back to SQL text with spacing that Spark's parser
    * accepts (space-separated except around punctuation).
    */
  def render(tokens: Seq[Token]): String = {
    val sb = new StringBuilder
    tokens.foreach { t =>
      if (sb.nonEmpty) {
        val last = sb.charAt(sb.length - 1)
        val first = t.text.charAt(0)
        if (last != '(' && first != ')' && first != ',')
          sb += ' '
      }
      sb ++= t.text
    }
    sb.result()
  }

  /** Digit-leading identifiers (ClickHouse-legal, Spark-illegal bare:
    * lecture_10.md's `2billion`, `AS 2m`) backtick-quoted per dotted
    * part for Spark SQL emission — applied by ChSqlRewrite as its final
    * pass, NOT inside render, so render stays a plain join and
    * tokenize∘render remains a token-level fixpoint.
    */
  def quoteDigitIdent(t: Token): Token =
    if (t.isIdent && Character.isDigit(t.text.charAt(0)))
      Token(t.text.split("\\.", -1).map { p =>
        if (p.nonEmpty && !p.startsWith("`") &&
          p.exists(Character.isLetter)) "`" + p + "`"
        else p
      }.mkString("."))
    else t
}
