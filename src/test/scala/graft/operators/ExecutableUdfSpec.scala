package graft.operators

import graft.SparkSpec

class ExecutableUdfSpec extends SparkSpec {
  import spark.implicits._

  test("pipeLines feeds rows through an external program per partition") {
    val ds = Seq("hello", "world").toDS().repartition(2)
    val out = ExecutableUdf.pipeLines(ds, "tr a-z A-Z").collect().toSet
    assert(out == Set("HELLO", "WORLD"))
  }

  test("pipeKeyed preserves row identity across the process boundary") {
    val df = Seq((1L, "abc"), (2L, "xyz"), (3L, "q")).toDF("id", "s")
    val out = ExecutableUdf.pipeKeyed(df, "id", "s", "tr a-z A-Z", "up")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "ABC", 2L -> "XYZ", 3L -> "Q"))
  }

  test("executableSource builds a dictionary frame from a command") {
    val df = ExecutableUdf.executableSource(spark,
      "printf '1\\tone\\n2\\ttwo\\n'", Seq("k", "name"))
    assert(df.count() == 2)
    assert(df.filter($"k" === "2").select("name").as[String].head() == "two")
  }
}
