package graft.tools

import graft.chsql.{ChLexer, ChSession}

/** Dev tool: replay every reference file's statements in order (the
  * ChSqlSweepSpec executed-subset loop) and dump each SELECT that fails
  * to execute, with its error, to /tmp/sweep_fails.txt — so the misses
  * can be triaged into (a) rewriter/feature gaps worth closing and
  * (b) genuinely out-of-scope statements (cross-file state, infra).
  */
object SweepDebug {

  /** The corpus's join/perf demos build ≥1e7-row `numbers()` fixtures
    * (lecture_10.md:44 inserts 2e9 rows). Executing those verbatim is
    * pure CI time, but skipping them left their five join SELECTs
    * unexecuted. Scaling every ≥7-digit `numbers()` argument down 1000x
    * keeps each demo's SHAPE — the 2billion:2million row ratio, the
    * sparse-step table, the join directions — at a bounded size, so the
    * demos execute in the sweep proper.
    */
  def downscaleNumbers(st: String): String = {
    val call = "(?i)numbers(_mt)?\\s*\\([^()]*\\)".r
    call.replaceAllIn(st, m => java.util.regex.Matcher.quoteReplacement(
      "\\d{7,}".r.replaceAllIn(m.matched,
        d => (d.matched.toLong / 1000L).toString)))
  }

  def main(args: Array[String]): Unit = {
    // SAME session shape as ChSqlSweepSpec (GraftExtensions included —
    // the predicate-UDF casts of hw04 need BoolNumericCoercion), so the
    // tool's count always reconciles with the spec's floor
    val spark = graft.GraftSession.create(master = "local[8]",
      shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Path.of("/root/reference")
    val it = java.nio.file.Files.walk(root).iterator()
    val mds = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
    while (it.hasNext) {
      val p = it.next()
      if (p.toString.endsWith(".md") || p.toString.endsWith(".sql")) mds += p
    }
    val fence = "(?s)```sql(.*?)```".r
    val external = "(?i)\\b(url|s3|postgresql|jdbc|odbc|mysql|file)\\s*\\(".r
    // a 7+-digit count in ANY argument position: numbers(2000000000)
    // AND numbers(1, 2000000000[, step]) (r12 — the start-offset form
    // escaped the first-arg-only detection and lecture_10's RIGHT join
    // sorted 2 BILLION rows: memory pressure -> multi-minute GC pauses
    // -> heartbeat kill, the exit-56 suite deaths)
    val bigNumbers = "(?i)numbers(_mt)?\\s*\\([^()]*\\d{7,}".r

    val out = new StringBuilder
    var executed = 0
    var total = 0
    mds.foreach { p =>
      val text = java.nio.file.Files.readString(p)
      val blocks =
        if (p.toString.endsWith(".sql")) Seq(text)
        else fence.findAllMatchIn(text).map(_.group(1)).toSeq
      val stmts = blocks.flatMap(b =>
        scala.util.Try(ChLexer.statements(b)).getOrElse(Nil))
      if (stmts.nonEmpty) {
        val session = new ChSession(spark)
        stmts.foreach { st0 =>
          val st =
            if (bigNumbers.findFirstIn(st0).isDefined) downscaleNumbers(st0)
            else st0
          val up = st.trim.toUpperCase
          val skip = up.contains("{") || external.findFirstIn(st).isDefined
          if (!skip) {
            if (up.startsWith("SELECT") || up.startsWith("WITH ")) {
              total += 1
              scala.util.Try(session.sql(st).limit(10).collect()) match {
                case scala.util.Success(_) => executed += 1
                case scala.util.Failure(e) =>
                  val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
                    .replaceAll("\\s+", " ").take(220)
                  out.append(s"FILE ${root.relativize(p)}\n")
                  out.append("STMT " + st.replaceAll("\\s+", " ").take(300) + "\n")
                  out.append("ERR  " + msg + "\n\n")
              }
            } else scala.util.Try(
              session.execute(st).foreach(_.limit(1).collect()))
          }
        }
      }
    }
    out.append(s"\nTOTAL executed $executed / $total\n")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of("/tmp/sweep_fails.txt"), out.toString)
    println(s"executed $executed / $total — details in /tmp/sweep_fails.txt")
    spark.stop()
  }
}
