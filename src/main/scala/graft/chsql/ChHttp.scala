package graft.chsql

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, struct, to_json}
import org.apache.spark.sql.types._

/** The ClickHouse HTTP interface over a [[ChSession]] — the surface the
  * reference drives with `curl` (lectures/lecture_03.md:264-299):
  *
  *   - `GET /ping` → `Ok.` and `GET /replicas_status` → `Ok.`
  *   - `GET /?query=SELECT%201` and `POST /` with the statement (or the
  *     tail of it) as the request body; when both are present they
  *     concatenate, which is exactly how the reference pipes CSV into
  *     `?query=INSERT INTO t FORMAT CSV` (lecture_03.md:43,196).
  *   - `FORMAT X` inside the query text, else the `default_format`
  *     parameter, else the `X-ClickHouse-Format` header, else
  *     TabSeparated — serialized by [[ChResultFormats]].
  *   - `param_name=value` query parameters bind `{name:Type}`
  *     placeholders (lecture_03.md:265-307) via [[ChParams]].
  *   - gzip both ways: `Content-Encoding: gzip` request bodies are
  *     inflated; responses compress when the client sends
  *     `Accept-Encoding: gzip` AND `enable_http_compression=1`
  *     (lecture_03.md:289-291 — compression is opt-in per request,
  *     matching the reference's flag).
  *   - `GET /play` → the minimal web UI page (lecture_03.md:269; the
  *     reference notes the server hands out a hardcoded HTML shell,
  *     lecture_22.md:5).
  *
  * Semantics, not plumbing: one server wraps ONE ChSession (a single-node
  * deployment's catalog); DDL/INSERT posted here lands in that session
  * exactly as `execute` would. Responses buffer server-side before the
  * status line — ClickHouse's `wait_end_of_query=1` mode — so errors
  * yield a real 500 + `X-ClickHouse-Exception-Code` instead of a torn
  * 200 stream. The buffer is client-bound output (the result the caller
  * asked to download), filled a partition at a time via
  * `toLocalIterator` — never a second copy of cluster-side data.
  */
final class ChHttpServer(spark: SparkSession, bindPort: Int = 0)
    extends AutoCloseable {

  val session = new ChSession(spark)

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
  // daemon workers: an embedded server must never pin the JVM open after
  // the driver's main exits (Verify/Bench construct one per query run)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    (r: Runnable) => {
      val t = new Thread(r, "ch-http-worker")
      t.setDaemon(true)
      t
    })
  server.setExecutor(pool)
  server.createContext("/", new RootHandler)
  server.start()

  /** Bound port (ephemeral when constructed with 0). */
  def port: Int = server.getAddress.getPort

  /** The reference's `predefined_query_handler` rule
    * (lectures/lecture_20.md:500-528): binds `path` to a fixed query —
    * e.g. `SELECT * FROM system.custom_prom_metrics FORMAT Prometheus` —
    * which is how ClickHouse exposes business metrics to a Prometheus
    * scraper. Query parameters on the request are ignored, as in the
    * reference's handler.
    */
  def addPredefinedQuery(path: String, query: String): Unit = {
    server.createContext(path, new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          val results = session.synchronized(session.execute(query))
          val format = ChResultFormats.declaredFormat(query)
            .getOrElse("TabSeparated")
          val buf = new ByteArrayOutputStream()
          results.lastOption.foreach(df =>
            ChResultFormats.write(df, format, buf))
          send(ex, 200, buf.toByteArray, ChResultFormats.contentType(format))
        } catch {
          case t: Throwable => sendError(ex, t)
        } finally ex.close()
    })
    ()
  }

  override def close(): Unit = {
    server.stop(0)
    pool.shutdownNow()
    ()
  }

  private final class RootHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try route(ex)
      catch { case t: Throwable => sendError(ex, t) }
      finally ex.close()

    private def route(ex: HttpExchange): Unit = ex.getRequestURI.getPath match {
      case "/ping" | "/replicas_status" =>
        send(ex, 200, "Ok.\n".getBytes(UTF_8), "text/plain; charset=UTF-8")
      case "/play" =>
        send(ex, 200, ChHttpServer.playHtml.getBytes(UTF_8),
          "text/html; charset=UTF-8")
      case _ => query(ex)
    }

    private def query(ex: HttpExchange): Unit = {
      val params = parseQueryString(ex.getRequestURI.getRawQuery)
      // streaming INSERT ingestion — the request-side twin of the chunked
      // response mode: `?query=INSERT INTO t FORMAT <line-format>` with a
      // payload body never materializes the upload in driver RAM. The
      // body streams through in line batches, each landing as its own
      // block (its own part, its own MV firing — exactly ClickHouse's
      // per-block contract for large inserts).
      if (params.get("query").exists(ChHttpServer.isLineFormatInsert) &&
        params.keys.forall(k => !k.startsWith("param_"))) {
        val q = params("query")
        val raw: InputStream =
          if (Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
                .exists(_.equalsIgnoreCase("gzip")))
            new GZIPInputStream(ex.getRequestBody)
          else ex.getRequestBody
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(raw, UTF_8))
        val batchLines =
          Integer.getInteger("graft.http.insert_batch_lines", 65536).intValue()
        // CSV records may contain quoted embedded newlines, so a record
        // can span raw lines — a batch must only cut on a record
        // boundary (even cumulative double-quote count; RFC "" escapes
        // add two, keeping the parity honest) or the two halves would
        // land as corrupt rows in different blocks
        val quoteAware = ChHttpServer.isCsvFormatInsert(q)
        val batches = new Iterator[String] {
          private var nextLine: String = reader.readLine()
          def hasNext: Boolean = nextLine != null
          def next(): String = {
            val sb = new StringBuilder
            var n = 0
            var openQuote = false
            // an UNTERMINATED quote (malformed CSV: a lone unescaped
            // quote flips the parity for the rest of the upload) must
            // not buffer the whole remaining body into one batch — cap
            // the carry at 4x the batch size and cut; only already-
            // corrupt input can reach the cap, and memory stays bounded
            val cap = batchLines * 4
            while (nextLine != null && (n < batchLines || openQuote) &&
              n < cap) {
              if (quoteAware) {
                var j = 0
                while (j < nextLine.length) {
                  if (nextLine.charAt(j) == '"') openQuote = !openQuote
                  j += 1
                }
              }
              sb ++= nextLine; sb += '\n'
              n += 1
              nextLine = reader.readLine()
            }
            sb.result()
          }
        }
        try {
          if (!batches.hasNext)
            throw new IllegalArgumentException(
              "INSERT ... FORMAT without data — inline payload expected")
          session.synchronized {
            val prevDb = session.currentDb
            session.httpClient = true
            try {
              params.get("database").foreach(db =>
                session.execute(s"USE ${ChHttpServer.validDbName(db)}"))
              session.insertStream(q, batches)
            } finally {
              session.currentDb = prevDb
              session.httpClient = false
            }
          }
          send(ex, 200, Array.emptyByteArray, "text/plain; charset=UTF-8")
        } finally reader.close()
        return
      }
      val body = readBody(ex)
      // CH concatenates the query URL parameter and the POST body — the
      // body is the statement itself, or an inline payload continuing a
      // `?query=INSERT INTO t FORMAT CSV` prefix
      val script = (params.get("query"), body) match {
        case (Some(q), b) if b.nonEmpty => q + "\n" + b
        case (Some(q), _) => q
        case (None, b) if b.trim.nonEmpty => b
        case _ =>
          send(ex, 200, "Ok.\n".getBytes(UTF_8),
            "text/plain; charset=UTF-8")
          return
      }
      val bindings = params.collect {
        case (k, v) if k.startsWith("param_") => k.stripPrefix("param_") -> v
      }
      // one catalog, four worker threads: statement dispatch serializes
      // on the session so concurrent requests can't interleave. The
      // Spark jobs themselves still run fully parallel inside the
      // cluster. param_x= and database= are REQUEST-scoped, exactly as
      // ClickHouse scopes them — bindings thread through execute's
      // per-call map and the default db restores afterward, so neither
      // leaks into later requests.
      val t0 = System.nanoTime()
      val results = session.synchronized {
        val prevDb = session.currentDb
        session.httpClient = true
        try {
          params.get("database").foreach(db =>
            session.execute(s"USE ${ChHttpServer.validDbName(db)}"))
          session.execute(script, bindings)
        } finally {
          session.currentDb = prevDb
          session.httpClient = false
        }
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      val format = ChResultFormats.declaredFormat(script)
        .orElse(params.get("default_format"))
        .orElse(Option(ex.getRequestHeaders.getFirst("X-ClickHouse-Format")))
        .getOrElse("TabSeparated")
      val gzip = gzipOk(ex, params)
      results.lastOption match {
        case Some(df) if !params.get("wait_end_of_query").contains("1") =>
          // ClickHouse's DEFAULT response mode STREAMS: chunked transfer,
          // bytes written as `toLocalIterator` drains partition by
          // partition, so a large download never materializes in driver
          // RAM. `wait_end_of_query=1` opts into the buffered mode below
          // (full body before the status line — reliable error codes).
          // Analysis/planning errors still 500 (forced before headers);
          // a RUNTIME failure mid-stream tears the chunked body, exactly
          // the trade ClickHouse documents for its streaming default.
          df.queryExecution.executedPlan
          ex.getResponseHeaders.set("X-ClickHouse-Format", format)
          ex.getResponseHeaders.set("Content-Type",
            ChResultFormats.contentType(format))
          if (gzip) ex.getResponseHeaders.set("Content-Encoding", "gzip")
          ex.sendResponseHeaders(200, 0) // 0 = chunked
          val raw: OutputStream = ex.getResponseBody
          val os: OutputStream =
            if (gzip) new GZIPOutputStream(raw, true) else raw
          try ChResultFormats.write(df, format, os, elapsed)
          catch {
            case t: Throwable =>
              // a RUNTIME failure after the 200 went out must not end in
              // a clean zero-chunk — the client would see an apparently
              // complete body missing rows. ClickHouse appends the
              // exception text into the stream and closes; do the same,
              // so the truncation is visible and machine-detectable.
              val code = ChHttpServer.exceptionCode(t)
              try os.write(
                (s"\nCode: $code. ${Option(t.getMessage).getOrElse(t.toString)}\n")
                  .getBytes(UTF_8))
              catch { case _: Throwable => () }
          }
          finally { try os.close() catch { case _: Throwable => () } }
        case other =>
          val buf = new ByteArrayOutputStream()
          other.foreach(df => ChResultFormats.write(df, format, buf, elapsed))
          ex.getResponseHeaders.set("X-ClickHouse-Format", format)
          send(ex, 200, buf.toByteArray, ChResultFormats.contentType(format),
            gzip)
      }
    }

  }

  /** Failure → 500 with the ClickHouse error code both in the body
    * (`Code: N. message`) and the `X-ClickHouse-Exception-Code` header,
    * mapped by [[ChHttpServer.exceptionCode]]. Shared by the root
    * handler and every predefined-query handler.
    */
  private def sendError(ex: HttpExchange, t: Throwable): Unit = {
    val code = ChHttpServer.exceptionCode(t)
    val msg = s"Code: $code. ${Option(t.getMessage).getOrElse(t.toString)}\n"
    ex.getResponseHeaders.set("X-ClickHouse-Exception-Code", code.toString)
    try send(ex, 500, msg.getBytes(UTF_8), "text/plain; charset=UTF-8")
    catch { case _: Throwable => () }
  }

  // ------------------------------------------------------------ http io

  private def readBody(ex: HttpExchange): String = {
    val raw: InputStream =
      if (Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
            .exists(_.equalsIgnoreCase("gzip")))
        new GZIPInputStream(ex.getRequestBody)
      else ex.getRequestBody
    try new String(raw.readAllBytes(), UTF_8)
    finally raw.close()
  }

  private def gzipOk(ex: HttpExchange, params: Map[String, String]): Boolean =
    params.get("enable_http_compression").contains("1") &&
      Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
        .exists(_.toLowerCase.contains("gzip"))

  private def send(ex: HttpExchange, code: Int, payload: Array[Byte],
                   contentType: String, gzip: Boolean = false): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    val out =
      if (gzip) {
        ex.getResponseHeaders.set("Content-Encoding", "gzip")
        val b = new ByteArrayOutputStream()
        val g = new GZIPOutputStream(b)
        g.write(payload); g.close()
        b.toByteArray
      } else payload
    ex.sendResponseHeaders(code, if (out.isEmpty) -1 else out.length.toLong)
    if (out.nonEmpty) {
      val os: OutputStream = ex.getResponseBody
      os.write(out); os.close()
    }
  }

  private def parseQueryString(raw: String): Map[String, String] =
    Option(raw).filter(_.nonEmpty).map { qs =>
      qs.split('&').iterator.filter(_.nonEmpty).map { kv =>
        val eq = kv.indexOf('=')
        val (k, v) =
          if (eq < 0) (kv, "") else (kv.take(eq), kv.drop(eq + 1))
        java.net.URLDecoder.decode(k, UTF_8) ->
          java.net.URLDecoder.decode(v, UTF_8)
      }.toMap
    }.getOrElse(Map.empty)
}

object ChHttpServer {

  /** True when the query parameter is a single bare INSERT ending in a
    * line-oriented FORMAT — the only shape the streaming ingestion path
    * handles. Values tuples may span lines (and multi-statement scripts
    * need the lexer), so everything else falls back to the buffered
    * script path.
    */
  private val lineFormatInsertRe =
    ("(?is)^\\s*INSERT\\s+INTO\\s+[^;]+\\bFORMAT\\s+(CSV|TSV|TabSeparated|" +
      "JSONEachRow|CSVWithNames|TSVWithNames|TabSeparatedWithNames)\\s*$").r
  def isLineFormatInsert(q: String): Boolean =
    lineFormatInsertRe.pattern.matcher(q).matches()

  /** True when the streaming-INSERT query's format is CSV-family — the
    * only line formats whose records may span raw lines (quoted embedded
    * newlines), so the upload batcher must cut on record boundaries.
    */
  def isCsvFormatInsert(q: String): Boolean = {
    val m = lineFormatInsertRe.pattern.matcher(q)
    m.matches() && m.group(1).toLowerCase.startsWith("csv")
  }

  /** The `database=` query parameter is a NAME, not a script — validate
    * before it splices into `USE $db` (a value like
    * `default; DROP TABLE t` would otherwise run as two statements).
    */
  private val dbNameRe = "[A-Za-z_][A-Za-z0-9_]*".r
  def validDbName(db: String): String = {
    if (!dbNameRe.pattern.matcher(db).matches())
      throw new IllegalArgumentException(
        s"database parameter '$db' is not a valid database name")
    db
  }

  /** The ClickHouse error code a failure maps to, matched on the
    * message our dialect layer raises (clients branch on
    * X-ClickHouse-Exception-Code — 60 UNKNOWN_TABLE, 36 BAD_ARGUMENTS,
    * 456 UNKNOWN_QUERY_PARAMETER, 62 SYNTAX_ERROR, 81 UNKNOWN_DATABASE,
    * 46 UNKNOWN_FUNCTION, 47 UNKNOWN_IDENTIFIER; 1000 otherwise).
    */
  def exceptionCode(t: Throwable): Int = {
    val m = Option(t.getMessage).getOrElse("").toLowerCase
    if (m.contains("no such table") || m.contains("no table") ||
      m.contains("table_or_view_not_found") ||
      m.contains("table or view not found") ||
      (m.contains("table or view") && m.contains("cannot be found")) ||
      m.contains("unknown table")) 60
    else if (m.contains("database") &&
      (m.contains("not found") || m.contains("no database") ||
        m.contains("unknown"))) 81
    else if (m.contains("has no bound value") ||
      m.contains("query parameter")) 456
    else if (m.contains("unknown function") ||
      m.contains("undefined function") ||
      m.contains("unresolved_routine") ||
      m.contains("cannot resolve function") ||
      m.contains("cannot resolve routine") ||
      m.contains("unresolved routine")) 46
    else if (m.contains("cannot resolve") ||
      m.contains("unresolved column") ||
      m.contains("unknown identifier")) 47
    // only OUR outfile-rejection/overwrite messages — a bare substring
    // match would misroute any error that merely ECHOES a query
    // containing INTO OUTFILE (e.g. a syntax error) to code 76
    // ONLY the three server-originated outfile messages — a bare
    // "into outfile:" substring can also arrive via an ECHOED string
    // literal inside a failing query, which must keep its own code
    else if (m.contains("into outfile is not allowed") ||
      m.contains("into outfile: file") ||
      m.contains("into outfile: could not move")) 76 // CANNOT_OPEN_FILE
    else if (m.contains("parseexception") || m.contains("syntax error") ||
      t.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException])
      62
    else if (t.isInstanceOf[IllegalArgumentException]) 36
    else 1000
  }

  /** The hand-rolled /play shell: the reference notes the server ships a
    * hardcoded HTML page whose JS posts queries back to `/`
    * (lecture_22.md:5). This one does exactly that, nothing more.
    */
  val playHtml: String =
    """<!DOCTYPE html><html><head><title>graft play</title></head><body>
      |<textarea id="q" rows="8" cols="80">SELECT 1</textarea><br>
      |<button onclick="run()">Run</button><pre id="out"></pre>
      |<script>async function run(){
      |  const r = await fetch('/', {method:'POST',
      |    body: document.getElementById('q').value});
      |  document.getElementById('out').textContent = await r.text();
      |}</script></body></html>
      |""".stripMargin
}

/** Output serialization for the HTTP (and CLI `FORMAT`) surface: the
  * formats the reference actually passes over HTTP — TabSeparated (the
  * default), CSV, JSONEachRow, JSON, Values, Pretty, Vertical, each
  * [WithNames] where ClickHouse defines it (lecture_03.md:276-291,
  * homeworks/hw03.md). Row-streaming formats serialize from
  * `toLocalIterator` (one partition in memory at a time); Pretty pads
  * columns so it buffers — capped at ClickHouse's own
  * output_format_pretty_max_rows default of 10,000.
  */
object ChResultFormats {

  /** The trailing top-level `FORMAT X` of the LAST statement in
    * `script`, when that statement is a result-producing one. The
    * rewriter strips this tail before Spark sees the query; the HTTP
    * layer needs it to pick the response serialization.
    */
  def declaredFormat(script: String): Option[String] = {
    val heads = Set("SELECT", "WITH", "SHOW", "DESCRIBE", "DESC",
      "EXPLAIN", "EXISTS")
    // the body serialized is the LAST RESULT-PRODUCING statement, which
    // need not be the last statement of the script ("SELECT … FORMAT
    // JSON; CREATE TABLE …") — scan the last SELECT-like one
    ChLexer.statements(script).reverse
      .find(st => heads.exists(h => st.trim.toUpperCase.startsWith(h)))
      .flatMap { st =>
        val toks = ChLexer.tokenize(st)
        var depth = 0
        var found: Option[String] = None
        toks.indices.foreach { i =>
          val t = toks(i)
          if (!t.isString) {
            if (t.text == "(" || t.text == "[") depth += 1
            else if (t.text == ")" || t.text == "]") depth -= 1
            else if (depth == 0 && t.is("FORMAT") &&
              i + 1 < toks.length && toks(i + 1).isIdent &&
              // FORMAT X must be the tail — only a SETTINGS clause may
              // follow it ("FORMAT JSON SETTINGS k=v")
              (i == toks.length - 2 ||
                (i + 2 < toks.length && toks(i + 2).is("SETTINGS"))))
              found = Some(toks(i + 1).text)
          }
        }
        found
      }
  }

  def contentType(format: String): String = format.toLowerCase match {
    case f if f.startsWith("json") => "application/json; charset=UTF-8"
    case f if f.startsWith("csv") => "text/csv; charset=UTF-8"
    case _ => "text/plain; charset=UTF-8"
  }

  /** Serializes `df` in the named format. `elapsed` feeds the JSON
    * format's statistics block (rows_read/bytes_read report 0 — this
    * embedding does not meter scan volume; same honest-value contract as
    * system.query_log).
    */
  def write(df: DataFrame, format: String, out: OutputStream,
            elapsed: Double = 0.0): Unit = {
    val w = new java.io.PrintStream(out, false, "UTF-8")
    format.toLowerCase match {
      case "tabseparated" | "tsv" => tsv(df, w, names = false)
      case "tabseparatedwithnames" | "tsvwithnames" => tsv(df, w, names = true)
      case "csv" => csv(df, w, names = false)
      case "csvwithnames" => csv(df, w, names = true)
      case "jsoneachrow" | "jsonlines" | "ndjson" =>
        jsonLines(df).foreach(w.println)
      case "json" => jsonFull(df, w, elapsed)
      case "values" =>
        w.println(rows(df).map(r =>
          r.toSeq.map(chValue(_, quoted = true)).mkString("(", ",", ")"))
          .mkString(","))
      case "tabseparatedraw" | "tsvraw" =>
        // raw = no escaping: values with tabs/newlines are the caller's
        // problem, exactly ClickHouse's contract for this format
        rows(df).foreach(r => w.println(r.toSeq.map {
          case null => "\\N"
          case s: String => s
          case v => chValue(v, quoted = false)
        }.mkString("\t")))
      case "pretty" | "prettycompact" => pretty(df, w)
      case "vertical" => vertical(df, w)
      case "prometheus" => prometheus(df, w)
      case "null" => rows(df).foreach(_ => ()) // execute, emit nothing
      case other =>
        throw new IllegalArgumentException(s"unsupported FORMAT $other")
    }
    w.flush()
  }

  // ----------------------------------------------------------- formats

  private def rows(df: DataFrame): Iterator[Row] =
    df.toLocalIterator().asScala

  private def tsv(df: DataFrame, w: java.io.PrintStream,
                  names: Boolean): Unit = {
    if (names) w.println(df.columns.mkString("\t"))
    rows(df).foreach(r =>
      w.println(r.toSeq.map(chValue(_, quoted = false)).mkString("\t")))
  }

  private def csv(df: DataFrame, w: java.io.PrintStream,
                  names: Boolean): Unit = {
    def cell(v: Any): String = v match {
      // \N like ClickHouse (format_csv_null_representation) — a bare ""
      // would conflate NULL with the empty string
      case null => "\\N"
      case s: String =>
        // quote the empty string too: an unquoted empty field reads
        // back as NULL through the CSV reader
        if (s.isEmpty ||
          s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
      case other => chValue(other, quoted = false)
    }
    if (names) w.println(df.columns.map(cell).mkString(","))
    rows(df).foreach(r => w.println(r.toSeq.map(cell).mkString(",")))
  }

  /** JSON lines via Catalyst's own JSON writer (distributed encode;
    * ignoreNullFields off so nulls appear, as ClickHouse writes them).
    */
  private def jsonLines(df: DataFrame): Iterator[String] = {
    val j = df.select(to_json(struct(df.columns.map(col).toSeq: _*),
      Map("ignoreNullFields" -> "false").asJava).as("j"))
    j.toLocalIterator().asScala.map(_.getString(0))
  }

  private def jsonFull(df: DataFrame, w: java.io.PrintStream,
                       elapsed: Double): Unit = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }
    w.println("{")
    w.println("\t\"meta\":")
    w.println("\t[")
    w.println(df.schema.fields.map(f =>
      s"""\t\t{"name": "${esc(f.name)}", "type": "${
        chTypeName(f.dataType, f.nullable)}"}""").mkString(",\n"))
    w.println("\t],")
    w.println("\t\"data\":")
    w.println("\t[")
    var n = 0L
    val it = jsonLines(df)
    while (it.hasNext) {
      val line = it.next()
      n += 1
      w.println("\t\t" + line + (if (it.hasNext) "," else ""))
    }
    w.println("\t],")
    w.println(s"""\t"rows": $n,""")
    w.println("\t\"statistics\":")
    w.println(f"""\t{"elapsed": $elapsed%.6f, "rows_read": 0, "bytes_read": 0}""")
    w.println("}")
  }

  private def pretty(df: DataFrame, w: java.io.PrintStream): Unit = {
    val cap = 10000 // ClickHouse output_format_pretty_max_rows default
    val data = rows(df).take(cap + 1).toVector
    val shown = data.take(cap)
    val cells = shown.map(_.toSeq.map(chValue(_, quoted = false)))
    val names = df.columns.toSeq
    val widths = names.indices.map(i =>
      (names(i).length +: cells.map(_(i).length)).max)
    val numeric = df.schema.fields.map(_.dataType match {
      case _: NumericType => true
      case _ => false
    })
    def pad(s: String, i: Int): String =
      if (numeric(i)) " " * (widths(i) - s.length) + s
      else s + " " * (widths(i) - s.length)
    w.println(names.indices.map(i =>
      "\u2500" + names(i) + "\u2500" * (widths(i) - names(i).length + 1))
      .mkString("\u250c", "\u252c", "\u2510"))
    cells.foreach { r =>
      w.println(r.indices.map(i => s" ${pad(r(i), i)} ")
        .mkString("\u2502", "\u2502", "\u2502"))
    }
    w.println(widths.map(wd => "\u2500" * (wd + 2))
      .mkString("\u2514", "\u2534", "\u2518"))
    if (data.length > cap) w.println(s"Showed first $cap.")
  }

  /** FORMAT Prometheus (lectures/lecture_20.md:497-546): the result set
    * carries `name`/`value` columns, optionally `help`, `type` and a
    * `labels` map — the reference builds exactly this shape in its
    * custom_prom_metrics views (`'merges' AS name, count() AS value,
    * 'active merges' AS help, map('hostname', hostName()) AS labels,
    * 'gauge' AS type`) and exposes it via a predefined_query_handler.
    */
  private def prometheus(df: DataFrame, w: java.io.PrintStream): Unit = {
    val cols = df.columns.map(_.toLowerCase).zipWithIndex.toMap
    val nameAt = cols.getOrElse("name",
      throw new IllegalArgumentException(
        "FORMAT Prometheus needs a 'name' column"))
    val valueAt = cols.getOrElse("value",
      throw new IllegalArgumentException(
        "FORMAT Prometheus needs a 'value' column"))
    def sanitize(s: String): String = s.replaceAll("[^a-zA-Z0-9_:]", "_")
    rows(df).foreach { r =>
      val name = sanitize(String.valueOf(r.get(nameAt)))
      cols.get("help").map(r.get).filter(_ != null).foreach(h =>
        w.println(s"# HELP $name ${String.valueOf(h).replace("\n", " ")}"))
      cols.get("type").map(r.get).filter(_ != null).foreach(t =>
        w.println(s"# TYPE $name ${String.valueOf(t)}"))
      val labels = cols.get("labels").map(r.get) match {
        case Some(m: scala.collection.Map[_, _]) if m.nonEmpty =>
          m.toSeq.map { case (k, v) =>
            s"""${sanitize(String.valueOf(k))}="${
              String.valueOf(v).replace("\\", "\\\\").replace("\"", "\\\"")}""""
          }.mkString("{", ",", "}")
        case _ => ""
      }
      w.println(s"$name$labels ${chValue(r.get(valueAt), quoted = false)}")
    }
  }

  private def vertical(df: DataFrame, w: java.io.PrintStream): Unit = {
    val names = df.columns
    val nameW = (0 +: names.map(_.length).toSeq).max
    var i = 0
    rows(df).foreach { r =>
      i += 1
      w.println(s"Row $i:")
      w.println("\u2500" * 6)
      names.indices.foreach { c =>
        w.println(names(c) + ":" + " " * (nameW - names(c).length + 1) +
          chValue(r.get(c), quoted = false))
      }
      w.println()
    }
  }

  // ------------------------------------------------------------ values

  /** One value in ClickHouse text form. `quoted` is the nested/Values
    * position (strings quoted, NULL spelled out); unquoted is the TSV
    * cell position (tab/newline escaped, null is `\N`).
    */
  def chValue(v: Any, quoted: Boolean): String = v match {
    case null => if (quoted) "NULL" else "\\N"
    case s: String =>
      if (quoted)
        "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
      else
        s.replace("\\", "\\\\").replace("\t", "\\t")
          .replace("\n", "\\n").replace("\r", "\\r")
    case b: Array[Byte] => chValue(new String(b, UTF_8), quoted)
    case seq: scala.collection.Seq[_] =>
      seq.map(chValue(_, quoted = true)).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, mv) =>
        chValue(k, quoted = true) + ":" + chValue(mv, quoted = true)
      }.mkString("{", ",", "}")
    case r: Row =>
      r.toSeq.map(chValue(_, quoted = true)).mkString("(", ",", ")")
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case t: java.sql.Timestamp =>
      val s = t.toLocalDateTime.toString.replace('T', ' ')
      if (s.length == 16) s + ":00" else s
    case t: java.time.Instant =>
      chValue(java.sql.Timestamp.from(t), quoted)
    case t: java.time.LocalDateTime =>
      val s = t.toString.replace('T', ' ')
      if (s.length == 16) s + ":00" else s
    case b: Boolean => if (b) "true" else "false"
    case other => other.toString // Int/Long/Double/Date/LocalDate
  }

  /** Spark type → the ClickHouse type name the JSON meta block reports
    * (the inverse of [[ChTypes.parse]], for the types that round-trip).
    */
  def chTypeName(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case LongType => "Int64"
      case IntegerType => "Int32"
      case ShortType => "Int16"
      case ByteType => "Int8"
      case DoubleType => "Float64"
      case FloatType => "Float32"
      case StringType | BinaryType => "String"
      case BooleanType => "Bool"
      case DateType => "Date"
      case _: TimestampType => "DateTime64(6)"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case a: ArrayType => s"Array(${chTypeName(a.elementType, a.containsNull)})"
      case m: MapType =>
        s"Map(${chTypeName(m.keyType, nullable = false)}, ${
          chTypeName(m.valueType, m.valueContainsNull)})"
      case s: StructType =>
        "Tuple(" + s.fields.map(f =>
          s"${f.name} ${chTypeName(f.dataType, f.nullable)}").mkString(", ") + ")"
      case other => other.sql
    }
    dt match {
      case _: ArrayType | _: MapType | _: StructType => base
      case _ if nullable => s"Nullable($base)"
      case _ => base
    }
  }
}
