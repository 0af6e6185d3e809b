package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofLeft picks the most recent right row at or before left time") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (1L, 20L, 300.0), (2L, 6L, 400.0))
      .toDF("k", "t", "v")
    val out = Joins.asofLeft(left, right, "k", "t", "t", Seq("t", "v"))
      .select($"tag", $"asof_t", $"asof_v").collect().map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out("l1") == ((Some(5L), Some(100.0))))   // 10 >= 5, not 15
    assert(out("l2") == ((Some(20L), Some(300.0))))  // inclusive match at 20
    assert(out("l3") == ((None, None)))              // right t=6 > left t=5
  }

  test("leftAny never fans out") {
    val left = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val right = Seq((1, "x"), (1, "y"), (1, "z")).toDF("k", "rv")
    val out = Joins.leftAny(left, right, Seq("k"), Seq(col("rv").asc))
    assert(out.count() == 2)
    assert(out.filter($"k" === 1).select("rv").as[String].head() == "x")
  }

  test("paste zips by rank; pasteLarge zips by position") {
    val a = Seq(10, 20, 30).toDF("x")
    val b = Seq("c", "b", "a").toDF("y")
    val p = Joins.paste(a, Seq(col("x").asc), b, Seq(col("y").asc))
    assert(p.count() == 3)
    assert(p.filter($"x" === 10).select("y").as[String].head() == "a")
    val pl = Joins.pasteLarge(a, b)
    assert(pl.count() == 3)
  }
}
