package graft.chsql

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.SparkSpec

/** The HTTP interface end-to-end over loopback — each test replays a
  * curl idiom from lectures/lecture_03.md:264-299 against an embedded
  * [[ChHttpServer]].
  */
class ChHttpSpec extends SparkSpec {

  private lazy val server = new ChHttpServer(spark)
  private lazy val client = HttpClient.newHttpClient()
  private def base = s"http://127.0.0.1:${server.port}"

  private def get(pathAndQuery: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + pathAndQuery)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(pathAndQuery: String, body: String,
                   headers: Map[String, String] = Map.empty)
      : HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(base + pathAndQuery))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def enc(q: String): String =
    java.net.URLEncoder.encode(q, UTF_8)

  test("GET /ping and /replicas_status answer Ok. (lecture_03.md:273-274)") {
    assert(get("/ping").body() == "Ok.\n")
    assert(get("/replicas_status").body() == "Ok.\n")
  }

  test("GET /?query=SELECT%201 returns 1 as TabSeparated (lecture_03.md:276)") {
    val r = get("/?query=" + enc("SELECT 1"))
    assert(r.statusCode() == 200)
    assert(r.body() == "1\n")
    assert(r.headers().firstValue("X-ClickHouse-Format").get == "TabSeparated")
  }

  test("POST body statement with FORMAT Pretty (lecture_03.md:278)") {
    val r = post("/", "SELECT 1 AS a, 'x' AS b FORMAT Pretty")
    val body = r.body()
    assert(body.contains("\u250c\u2500a\u2500\u252c\u2500b\u2500\u2510"))
    assert(body.contains("\u2502 1 \u2502 x \u2502"))
    assert(body.contains("\u2514"))
  }

  test("DDL + INSERT via ?query= payload concatenation + SELECT back " +
    "(lecture_03.md:280, :43)") {
    assert(post("/", "CREATE TABLE http_t (a UInt8, s String) ENGINE = Memory")
      .statusCode() == 200)
    // the reference pipes CSV into ?query=INSERT INTO t FORMAT CSV
    val ins = post("/?query=" + enc("INSERT INTO http_t FORMAT CSV"),
      "1,one\n2,two\n3,three\n")
    assert(ins.statusCode() == 200, ins.body())
    val r = get("/?query=" + enc(
      "SELECT a, s FROM http_t ORDER BY a FORMAT TSVWithNames"))
    assert(r.body() == "a\ts\n1\tone\n2\ttwo\n3\tthree\n")
  }

  test("param_x binds {x:Type} placeholders (lecture_03.md:265-307)") {
    val r = get("/?param_n=41&query=" + enc("SELECT {n:UInt8} + 1 AS v"))
    assert(r.body() == "42\n")
    // request-scoped, as in ClickHouse: the next request has no param_n
    val leak = get("/?query=" + enc("SELECT {n:UInt8} + 1 AS v"))
    assert(leak.statusCode() == 500)
    assert(leak.body().contains("no bound value"))
    // a value with quotes binds verbatim
    val q = get("/?param_s=" + enc("O'Hara") + "&query=" +
      enc("SELECT {s:String} AS v"))
    assert(q.body() == "O'Hara\n")
  }

  test("default_format parameter and X-ClickHouse-Format header") {
    val viaParam = get("/?default_format=JSONEachRow&query=" +
      enc("SELECT 7 AS n, 'x' AS s"))
    assert(viaParam.body().trim == """{"n":7,"s":"x"}""")
    val viaHeader = post("/", "SELECT 7 AS n",
      Map("X-ClickHouse-Format" -> "CSVWithNames"))
    assert(viaHeader.body() == "n\n7\n")
    // FORMAT in the text wins over both
    val inText = get("/?default_format=CSV&query=" +
      enc("SELECT 7 AS n FORMAT JSONEachRow"))
    assert(inText.body().trim == """{"n":7}""")
  }

  test("JSON format carries meta/data/rows/statistics (lecture_03 HTTP JSON)") {
    val r = get("/?query=" + enc(
      "SELECT number AS n FROM numbers(3) FORMAT JSON"))
    val b = r.body()
    assert(b.contains(""""name": "n""""))
    assert(b.contains(""""type": "Int64""""))
    assert(b.contains(""""rows": 3"""))
    assert(b.contains(""""elapsed""""))
    assert(r.headers().firstValue("Content-Type").get
      .startsWith("application/json"))
  }

  test("gzip request body and opt-in gzip response (lecture_03.md:289-291)") {
    // request side: Content-Encoding: gzip body is inflated
    val bo = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bo)
    gz.write("SELECT 5 AS v".getBytes(UTF_8)); gz.close()
    val req = HttpRequest.newBuilder(URI.create(base + "/"))
      .header("Content-Encoding", "gzip")
      .POST(HttpRequest.BodyPublishers.ofByteArray(bo.toByteArray))
      .build()
    assert(client.send(req, HttpResponse.BodyHandlers.ofString()).body() == "5\n")

    // response side: only compressed when BOTH the flag and the header ask
    val plain = client.send(
      HttpRequest.newBuilder(URI.create(
        base + "/?query=" + enc("SELECT 5 AS v")))
        .header("Accept-Encoding", "gzip").build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(plain.headers().firstValue("Content-Encoding").isEmpty)
    val gzed = client.send(
      HttpRequest.newBuilder(URI.create(
        base + "/?enable_http_compression=1&query=" + enc("SELECT 5 AS v")))
        .header("Accept-Encoding", "gzip").build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(gzed.headers().firstValue("Content-Encoding").get == "gzip")
    val inflated = new String(new GZIPInputStream(
      new java.io.ByteArrayInputStream(gzed.body())).readAllBytes(), UTF_8)
    assert(inflated == "5\n")
  }

  test("a failing query yields 500 + X-ClickHouse-Exception-Code, not a " +
    "torn 200") {
    val r = get("/?query=" + enc("SELECT * FROM no_such_table_anywhere"))
    assert(r.statusCode() == 500)
    assert(r.headers().firstValue("X-ClickHouse-Exception-Code").isPresent)
    assert(r.body().startsWith("Code:"))
  }

  test("GET /play serves the web shell (lecture_03.md:269, lecture_22.md:5)") {
    val r = get("/play")
    assert(r.statusCode() == 200)
    assert(r.body().contains("<textarea"))
  }

  test("Values / Vertical / TSV null-and-array rendering") {
    val vals = get("/?query=" + enc(
      "SELECT 1 AS a, 'it''s' AS s, [1,2] AS arr FORMAT Values")).body()
    assert(vals.trim == "(1,'it\\'s',[1,2])")
    val vert = get("/?query=" + enc(
      "SELECT 1 AS a, 'x' AS b FORMAT Vertical")).body()
    assert(vert.contains("Row 1:"))
    assert(vert.contains("a: 1"))
    val nulls = get("/?query=" + enc(
      "SELECT CAST(NULL AS Nullable(Int64)) AS v")).body()
    assert(nulls == "\\N\n")
  }

  test("predefined_query_handler + FORMAT Prometheus replay lecture_20's " +
    "custom-metrics story (lecture_20.md:497-546)") {
    // the reference builds views shaped name/value/help/labels/type and
    // binds a fixed query to a URL for the Prometheus scraper
    server.session.execute(
      """CREATE TABLE metric_src (v UInt8) ENGINE = Memory;
        |INSERT INTO metric_src VALUES (1), (2), (3)""".stripMargin)
    server.session.execute(
      "CREATE VIEW prom_merges AS SELECT 'merges' AS name, " +
        "count() AS value, 'active merges' AS help, " +
        "map('hostname', 'h1') AS labels, 'gauge' AS type FROM metric_src")
    server.addPredefinedQuery("/custom_metrics",
      "SELECT name, value, help, labels, type FROM prom_merges " +
        "FORMAT Prometheus")
    val r = get("/custom_metrics")
    assert(r.statusCode() == 200)
    val lines = r.body().linesIterator.toSeq
    assert(lines.contains("# HELP merges active merges"))
    assert(lines.contains("# TYPE merges gauge"))
    assert(lines.contains("""merges{hostname="h1"} 3"""))
  }

  test("TSVRaw leaves values unescaped; JSONLines aliases JSONEachRow") {
    val raw = get("/?query=" + enc(
      "SELECT 'a\\tb' AS s FORMAT TSVRaw")).body()
    assert(raw == "a\tb\n") // the literal tab survives un-escaped
    val escaped = get("/?query=" + enc(
      "SELECT 'a\\tb' AS s FORMAT TSV")).body()
    assert(escaped == "a\\tb\n") // default TSV escapes it
    val jl = get("/?query=" + enc("SELECT 3 AS v FORMAT JSONLines")).body()
    assert(jl.trim == """{"v":3}""")
  }

  test("param_x splice validation: a malicious Identifier / Array value " +
    "is rejected with an error, not spliced into the statement") {
    server.session.execute(
      "CREATE TABLE http_inj (id UInt8) ENGINE = Memory; " +
        "INSERT INTO http_inj VALUES (1), (2)")
    // a valid identifier binds fine
    val ok = get("/?query=" + enc("SELECT max({c:Identifier}) AS m FROM http_inj") +
      "&param_c=id")
    assert(ok.statusCode() == 200 && ok.body() == "2\n")
    // an injection payload in an Identifier slot is rejected 500/36
    val bad = get("/?query=" + enc("SELECT max({c:Identifier}) AS m FROM http_inj") +
      "&param_c=" + enc("id); DROP TABLE http_inj; --"))
    assert(bad.statusCode() == 500)
    assert(bad.headers().firstValue("X-ClickHouse-Exception-Code").get == "36")
    // ... and nothing was dropped
    assert(get("/?query=" + enc("SELECT count() FROM http_inj")).body() == "2\n")
    // Array text forms: literals pass, smuggled statements do not
    val arrOk = get("/?query=" + enc("SELECT {a:Array(UInt8)} AS v") +
      "&param_a=" + enc("[1, 2, 3]"))
    assert(arrOk.statusCode() == 200)
    val arrBad = get("/?query=" + enc("SELECT {a:Array(UInt8)} AS v") +
      "&param_a=" + enc("[1]); DROP TABLE http_inj; --"))
    assert(arrBad.statusCode() == 500)
    assert(get("/?query=" + enc("SELECT count() FROM http_inj")).body() == "2\n")
  }

  test("X-ClickHouse-Exception-Code maps the failure kind (60 unknown " +
    "table, 456 unbound parameter), not a blanket 62") {
    val noTable = get("/?query=" + enc("SELECT * FROM http_no_such_t"))
    assert(noTable.statusCode() == 500)
    assert(noTable.headers().firstValue("X-ClickHouse-Exception-Code")
      .get == "60")
    val unbound = get("/?query=" + enc("SELECT {nope:UInt8}"))
    assert(unbound.statusCode() == 500)
    assert(unbound.headers().firstValue("X-ClickHouse-Exception-Code")
      .get == "456")
  }

  test("declaredFormat follows the serialized statement: FORMAT on a " +
    "non-final SELECT and a FORMAT ... SETTINGS tail are both honored") {
    // the LAST statement is DDL; the body serialized is the SELECT — its
    // FORMAT JSON must drive the response serialization
    val r = post("/",
      "SELECT 7 AS v FORMAT JSON; CREATE TABLE http_fmt_t (a UInt8) ENGINE = Memory")
    assert(r.statusCode() == 200)
    assert(r.body().contains("\"data\""))
    assert(r.headers().firstValue("X-ClickHouse-Format").get == "JSON")
    // FORMAT X SETTINGS k=v: FORMAT is penultimate-clause, still detected
    val s2 = post("/", "SELECT 8 AS v FORMAT JSONEachRow SETTINGS max_threads=1")
    assert(s2.statusCode() == 200)
    assert(s2.body().trim == """{"v":8}""")
  }

  test("multi-statement script serializes the last result; DDL-only " +
    "scripts return an empty 200") {
    val r = post("/",
      "CREATE TABLE http_m (v UInt8) ENGINE = Memory; " +
        "INSERT INTO http_m VALUES (9); SELECT v FROM http_m")
    assert(r.body() == "9\n")
    val ddl = post("/", "CREATE TABLE http_m2 (v UInt8) ENGINE = Memory")
    assert(ddl.statusCode() == 200)
    assert(ddl.body().isEmpty)
  }

  test("review regressions: escape-smuggled Array values rejected, " +
    "backticked Identifier accepted, database= injection rejected, " +
    "unknown function maps to 46") {
    server.session.execute(
      "CREATE TABLE http_rr (id UInt8, `my col` UInt8) ENGINE = Memory; " +
        "INSERT INTO http_rr VALUES (1, 7)")
    // backslash escapes are NOT a lexer escape — a value relying on them
    // to hide a quote must be rejected, not spliced
    val smuggle = get("/?query=" + enc("SELECT {a:Array(String)} AS v") +
      "&param_a=" + enc("['a\\', 1)] union all select 1 from http_rr ''"))
    assert(smuggle.statusCode() == 500)
    // backtick-quoted identifiers are valid ClickHouse names
    val tick = get("/?query=" + enc("SELECT max({c:Identifier}) AS m FROM http_rr") +
      "&param_c=" + enc("`my col`"))
    assert(tick.statusCode() == 200 && tick.body() == "7\n")
    // database= is a NAME, not a script
    val dbInj = get("/?query=" + enc("SELECT 1") +
      "&database=" + enc("default; DROP TABLE http_rr"))
    assert(dbInj.statusCode() == 500)
    assert(get("/?query=" + enc("SELECT count() FROM http_rr")).body() == "1\n")
    // unknown function → 46 UNKNOWN_FUNCTION (not 47)
    val fn = get("/?query=" + enc("SELECT graft_no_such_fn(1)"))
    assert(fn.statusCode() == 500)
    assert(fn.headers().firstValue("X-ClickHouse-Exception-Code").get == "46")
  }

  test("a runtime failure mid-stream appends the exception text into the " +
    "chunked body (never a clean-looking truncated 200)") {
    spark.udf.register("graft_boom_late", (n: Long) => {
      if (n > 900000L) throw new RuntimeException("boom at row " + n)
      n
    })
    val r = get("/?query=" + enc(
      "SELECT graft_boom_late(number) AS n FROM numbers(1000000) FORMAT TSV"))
    assert(r.statusCode() == 200) // headers were already out — by design
    assert(r.body().contains("Code: "),
      "the exception marker must be visible in the stream")
  }

  test("streaming INSERT ingestion: the upload lands in line batches — " +
    "one block (one part, one MV firing) per batch, never a full-body " +
    "buffer") {
    System.setProperty("graft.http.insert_batch_lines", "1000")
    try {
      server.session.execute(
        "CREATE TABLE http_bulk (a UInt32, b String) " +
          "ENGINE = MergeTree ORDER BY a")
      val payload = (1 to 2500).map(i => s"$i,row$i").mkString("\n")
      val r = post("/?query=" + enc("INSERT INTO http_bulk FORMAT CSV"), payload)
      assert(r.statusCode() == 200)
      assert(get("/?query=" + enc("SELECT count() FROM http_bulk")).body()
        == "2500\n")
      // 2500 lines at 1000/batch = 3 blocks = 3 parts
      assert(get("/?query=" + enc(
        "SELECT count() FROM system.parts WHERE table = 'http_bulk'")).body()
        == "3\n")
      // *WithNames: the first batch's header replays onto later batches
      server.session.execute(
        "CREATE TABLE http_bulk2 (a UInt32, b String) ENGINE = Memory")
      val named = "b,a\n" + (1 to 1500).map(i => s"row$i,$i").mkString("\n")
      assert(post("/?query=" + enc(
        "INSERT INTO http_bulk2 FORMAT CSVWithNames"), named)
        .statusCode() == 200)
      val agg = get("/?query=" + enc(
        "SELECT count(), sum(a) FROM http_bulk2")).body()
      assert(agg == s"1500\t${(1 to 1500).map(_.toLong).sum}\n")
    } finally { System.clearProperty("graft.http.insert_batch_lines"); () }
  }

  test("default response mode STREAMS (chunked, bounded buffering): " +
    "first bytes arrive before the tail partition executes; " +
    "wait_end_of_query=1 buffers with a Content-Length") {
    // a UDF marks when the LAST rows of the range are computed; with the
    // streamed (chunked) response, toLocalIterator drains partition by
    // partition, so the client reads the head of the body while the tail
    // partition has not yet run. 5M TSV rows (~40 MB) cannot hide in TCP
    // buffers, so a buffering server would set the marker before the
    // first byte is readable.
    ChHttpStreamProbe.tailSeen = false
    spark.udf.register("graft_mark_tail", (n: Long) => {
      if (n >= 4999000L) ChHttpStreamProbe.tailSeen = true
      n
    })
    val q = enc(
      "SELECT graft_mark_tail(number) AS n FROM numbers(5000000) FORMAT TSV")
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(base + "/?query=" + q)).build(),
      HttpResponse.BodyHandlers.ofInputStream())
    assert(resp.statusCode() == 200)
    assert(resp.headers().firstValue("content-length").isEmpty,
      "streamed response must be chunked, not Content-Length framed")
    val in = resp.body()
    val first = in.read()
    assert(first == '0'.toInt)
    assert(!ChHttpStreamProbe.tailSeen,
      "first body byte must be readable before the tail partition runs")
    var total = 1L
    val buf = new Array[Byte](1 << 16)
    var r = in.read(buf)
    while (r >= 0) { total += r; r = in.read(buf) }
    in.close()
    assert(total > 30L * 1000 * 1000, s"short body: $total")
    assert(ChHttpStreamProbe.tailSeen)
    // buffered mode on request: full body behind a Content-Length
    val buffered = get("/?query=" + enc("SELECT 1") + "&wait_end_of_query=1")
    assert(buffered.body() == "1\n")
    assert(buffered.headers().firstValue("content-length").isPresent)
  }

  test("streaming CSV INSERT: a quoted embedded newline straddling the " +
    "batch boundary stays ONE record (quote-parity-aware batcher)") {
    System.setProperty("graft.http.insert_batch_lines", "2")
    try {
      server.session.execute(
        "CREATE TABLE http_csvnl (a UInt32, b String) ENGINE = Memory")
      // record 2 spans raw lines 2-3 — exactly across the 2-line cut; a
      // parity-blind batcher would split it into two corrupt rows in
      // different blocks
      val payload =
        "1,\"one\"\n2,\"two\nstill two\"\n3,three\n4,four\n5,five\n"
      val r = post("/?query=" + enc("INSERT INTO http_csvnl FORMAT CSV"),
        payload)
      assert(r.statusCode() == 200, r.body())
      val got = get("/?query=" + enc(
        "SELECT a, b FROM http_csvnl ORDER BY a FORMAT TSV")).body()
      // TSV output escapes the embedded newline as \n
      assert(got ==
        "1\tone\n2\ttwo\\nstill two\n3\tthree\n4\tfour\n5\tfive\n")
    } finally { System.clearProperty("graft.http.insert_batch_lines"); () }
  }

  test("INTO OUTFILE is rejected over HTTP — a client-side feature " +
    "(Code 76), so HTTP callers cannot create server-side files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_of")
    val r = get("/?query=" +
      enc(s"SELECT 1 AS a INTO OUTFILE '$dir/x.csv'") +
      "&wait_end_of_query=1")
    assert(r.statusCode() == 500)
    assert(r.headers().firstValue("X-ClickHouse-Exception-Code").get == "76")
    assert(r.body().startsWith("Code: 76."))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Path.of(s"$dir/x.csv")),
      "the rejected export must not have touched the filesystem")
    // the same statement through the embedded session still works — the
    // restriction is scoped to the HTTP surface, not the feature
    server.session.execute(
      s"SELECT 1 AS a INTO OUTFILE '$dir/direct.csv'")
    assert(java.nio.file.Files.exists(
      java.nio.file.Path.of(s"$dir/direct.csv")))
    // all three server-originated outfile failure spellings map to 76:
    // the HTTP rejection, file-exists, and the move-into-place failure
    Seq(
      "INTO OUTFILE is not allowed: it is a client-side feature",
      s"INTO OUTFILE: file $dir/x.csv already exists — use TRUNCATE/APPEND",
      s"INTO OUTFILE: could not move the export into place at $dir/x.csv"
    ).foreach { msg =>
      assert(ChHttpServer.exceptionCode(new RuntimeException(msg)) == 76,
        s"expected 76 for: $msg")
    }
    // a SYNTAX error whose message merely echoes a query containing
    // INTO OUTFILE must not be misrouted to 76 — even when the echoed
    // text carries the colon inside a string literal
    assert(ChHttpServer.exceptionCode(new RuntimeException(
      "syntax error near INTO OUTFILE 'x.csv'")) == 62)
    assert(ChHttpServer.exceptionCode(new RuntimeException(
      "unknown table echoing SELECT 'report INTO OUTFILE: daily'")) == 60)
  }

  test("a predefined-query handler failure maps through the error-code " +
    "table (unknown table = 60, not a blanket 62)") {
    server.addPredefinedQuery("/broken_metrics",
      "SELECT * FROM no_such_table_for_handler FORMAT Prometheus")
    val r = get("/broken_metrics")
    assert(r.statusCode() == 500)
    assert(r.headers().firstValue("X-ClickHouse-Exception-Code").get == "60")
    assert(r.body().startsWith("Code: 60."))
  }
}

/** Cross-JVM-visible probe for the streaming test (local mode: executors
  * share the JVM, so a static flag observes partition execution order).
  */
object ChHttpStreamProbe { @volatile var tailSeen = false }
