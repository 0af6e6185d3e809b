package graft.functions

import graft.SparkSpec

class ChUdfsSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE FUNCTION inlines an expression macro usable from SQL") {
    val udfs = new ChUdfs(spark)
    udfs.createFunction("linEq", Seq("x", "k", "b"), "k * x + b", orReplace = true)
    Seq(1.0, 2.0).toDF("x").createOrReplaceTempView("t_udf")
    val out = spark.sql("SELECT linEq(x, 10.0, 1.0) AS y FROM t_udf ORDER BY y")
      .as[Double].collect().toSeq
    assert(out == Seq(11.0, 21.0))
  }

  test("uniqueness, recursion and unknown-parameter checks") {
    val udfs = new ChUdfs(spark)
    udfs.createFunction("fOnce", Seq("x"), "x + 1", orReplace = true)
    intercept[IllegalArgumentException](
      udfs.createFunction("fOnce", Seq("x"), "x + 2"))
    intercept[IllegalArgumentException](
      udfs.createFunction("fRec", Seq("x"), "fRec(x)"))
    intercept[IllegalArgumentException](
      udfs.createFunction("fBad", Seq("x"), "x + y"))
  }

  test("DROP FUNCTION removes it; list shows origin-style entries") {
    val udfs = new ChUdfs(spark)
    udfs.createFunction("fTmp", Seq("a"), "a * 2", orReplace = true)
    assert(udfs.list.exists(_._1 == "fTmp"))
    udfs.dropFunction("fTmp")
    assert(!udfs.list.exists(_._1 == "fTmp"))
    intercept[Exception](spark.sql("SELECT fTmp(1)").collect())
  }

  test("lambda-bound names in macro bodies are not treated as parameters") {
    val udfs = new ChUdfs(spark)
    udfs.createFunction("fSumSq", Seq("arr"),
      "aggregate(arr, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)",
      orReplace = true)
    val v = spark.sql("SELECT fSumSq(array(1, 2, 3)) AS v")
      .collect().head.getDouble(0)
    assert(v == 14.0)
    // free variables outside lambdas still rejected
    intercept[IllegalArgumentException](
      udfs.createFunction("fBad2", Seq("arr"),
        "aggregate(arr, z, (acc, x) -> acc + x)"))
  }

  test("macros optimize through Catalyst (constant folding)") {
    val udfs = new ChUdfs(spark)
    udfs.createFunction("fFold", Seq("x"), "x * 2", orReplace = true)
    val plan = spark.sql("SELECT fFold(21) AS v").queryExecution.optimizedPlan
    assert(plan.toString.contains("42")) // folded at plan time, no runtime call
  }
}
