package graft.tools

import graft.chsql.{ChLexer, ChSession}

/** JUDGE SCRATCH (untracked): replay one reference file with timings. */
object JudgeSweepTrace {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(master = "local[8]",
      shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("--all")) {
      // walk the whole corpus in sorted (deterministic) order, one
      // session per file, statement-level progress — pins a wedge to a
      // statement; a file that fails to read or replay is reported and
      // skipped, never aborts the walk
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Path.of("/root/reference")
      val walk = java.nio.file.Files.walk(root)
      val files =
        try walk.iterator().asScala
          .filter(q => java.nio.file.Files.isRegularFile(q) &&
            (q.toString.endsWith(".md") || q.toString.endsWith(".sql")))
          .toVector.sortBy(_.toString)
        finally walk.close()
      files.foreach { q =>
        println(s"== FILE $q"); Console.flush()
        scala.util.Try(traceFile(spark, q)).failed.foreach(e =>
          println(s"== FILE $q SKIPPED: ${e.getMessage}"))
      }
      println("TRACE COMPLETE")
      return
    }
    val p = java.nio.file.Path.of(
      args.headOption.getOrElse("/root/reference/lectures/lecture_10.md"))
    traceFile(spark, p)
    println("TRACE COMPLETE")
  }

  private def traceFile(spark: org.apache.spark.sql.SparkSession,
                        p: java.nio.file.Path): Unit = {
    val text = java.nio.file.Files.readString(p)
    val fence = "(?s)```sql(.*?)```".r
    val external = "(?i)\\b(url|s3|postgresql|jdbc|odbc|mysql|file)\\s*\\(".r
    // a 7+-digit count in ANY argument position: numbers(2000000000)
    // AND numbers(1, 2000000000[, step]) (r12 — the start-offset form
    // escaped the first-arg-only detection and lecture_10's RIGHT join
    // sorted 2 BILLION rows: memory pressure -> multi-minute GC pauses
    // -> heartbeat kill, the exit-56 suite deaths)
    val bigNumbers = "(?i)numbers(_mt)?\\s*\\([^()]*\\d{7,}".r
    val blocks = fence.findAllMatchIn(text).map(_.group(1)).toSeq
    val stmts = blocks.flatMap(b =>
      scala.util.Try(ChLexer.statements(b)).getOrElse(Nil))
    val session = new ChSession(spark)
    stmts.zipWithIndex.foreach { case (st0, ix) =>
      val st =
        if (bigNumbers.findFirstIn(st0).isDefined)
          SweepDebug.downscaleNumbers(st0)
        else st0
      val up = st.trim.toUpperCase
      val skip = up.contains("{") || external.findFirstIn(st).isDefined
      if (!skip) {
        println(s"  [$ix] ${st.replaceAll("\\s+", " ").take(110)}")
        Console.flush()
        val t0 = System.nanoTime()
        val r =
          if (up.startsWith("SELECT") || up.startsWith("WITH "))
            scala.util.Try(session.sql(st).limit(10).collect())
          else scala.util.Try(session.execute(st).foreach(_.limit(1).collect()))
        println(f"  [$ix] ${if (r.isSuccess) "ok" else "ERR " + r.failed.get.getMessage.linesIterator.next().take(80)} in ${(System.nanoTime() - t0) / 1e9}%.1fs")
        Console.flush()
      }
    }
  }
}
