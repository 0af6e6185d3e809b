package graft.tools

import graft.chsql.{ChSession, ChSqlRewrite}

/** JUDGE SCRATCH (untracked): reproduce the lecture_10 right-join stall. */
object JudgeRepro {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(master = "local[4]",
      shufflePartitions = 4)
    spark.sparkContext.setLogLevel("ERROR")
    val s = new ChSession(spark)
    s.execute("CREATE TABLE `2billion` (idx UInt64) ENGINE = MergeTree ORDER BY idx")
    s.execute("CREATE TABLE `2million` (idx UInt64) ENGINE = MergeTree ORDER BY idx")
    s.execute("INSERT INTO `2billion` SELECT number AS idx FROM numbers(2000000)")
    s.execute("INSERT INTO `2million` SELECT (number * 1000) AS idx FROM numbers(2000)")
    val q = "select count(*) from 2billion right join 2million using(idx)"
    println("building DataFrame (rewrite + analysis)...")
    val df = s.sql(q)
    println("ANALYZED:\n" + df.queryExecution.analyzed.treeString)
    println("PHYSICAL:\n" + df.queryExecution.executedPlan.treeString)
    val t0 = System.nanoTime()
    val rows = df.limit(10).collect()
    println(s"RESULT ${rows.mkString} in ${(System.nanoTime()-t0)/1e9}s")
  }
}
