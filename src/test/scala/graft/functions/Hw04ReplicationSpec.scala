package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ChFunctions._
import graft.sources.Formats

/** Replicates the reference's homeworks/hw04.md flow (aggregates, type
  * functions, SQL UDFs) on its own deterministic `transactions` fixture
  * (numbers(1000)-derived, hw04.md:4-23) — results computed in closed
  * form where the homework's output depends only on the generator.
  */
class Hw04ReplicationSpec extends SparkSpec {
  import spark.implicits._

  // CREATE TABLE transactions ... INSERT ... FROM numbers(1000)
  private lazy val transactions = Formats.numbers(spark, 1000)
    .select(
      col("number").as("transaction_id"),
      (col("number") % 100 + 1).as("user_id"),
      (col("number") % 10 + 1).as("product_id"),
      (col("number") % 5 + 1).as("quantity"),
      (col("number") / 100000.0).as("price"),
      date_add(lit("2022-01-01").cast("date"), col("number").cast("int"))
        .as("transaction_date"))

  test("aggregate block (hw04.md:27-44)") {
    // sum(price) = sum(0..999)/100000 = 4.995
    val sumPrice = transactions.agg(sum($"price")).as[Double].head()
    assert(math.abs(sumPrice - 4.995) < 1e-9)
    // avg(price) = 4.995 / 1000
    val avgPrice = transactions.agg(avg($"price")).as[Double].head()
    assert(math.abs(avgPrice - 0.004995) < 1e-12)
    // countDistinct(user_id) = 100
    assert(transactions.agg(countDistinct($"user_id")).as[Long].head() == 100L)
  }

  test("type-function block (hw04.md:47-74)") {
    val r = transactions.filter($"transaction_id" === 42)
      .select(
        toStringCh($"transaction_date").as("d_str"),
        year($"transaction_date").as("y"),
        month($"transaction_date").as("m"),
        toYYYYMM($"transaction_date").as("ym"),
        ceil($"price").as("ceil_p"),
        toStringCh($"transaction_id").as("id_str"))
      .collect().head
    assert(r.getString(0) == "2022-02-12") // 2022-01-01 + 42 days
    assert(r.getInt(1) == 2022 && r.getInt(2) == 2 && r.getInt(3) == 202202)
    assert(r.getLong(4) == 1L)             // ceiling of 0.00042
    assert(r.getString(5) == "42")
  }

  test("UDF block (hw04.md:78-104): create, use, classify, list, drop") {
    val udfs = new ChUdfs(spark)
    udfs.createFunction("some_brand_new_func", Seq("quantity", "price"),
      "quantity * price", orReplace = true)
    udfs.createFunction("some_brand_new_func_classify", Seq("quantity", "price"),
      "quantity * price > 0.01", orReplace = true)
    transactions.createOrReplaceTempView("transactions")
    val total = spark.sql(
      """SELECT transaction_id, some_brand_new_func(quantity, price) AS rev
        |FROM transactions ORDER BY transaction_id LIMIT 5""".stripMargin)
      .as[(Long, Double)].collect()
    assert(total.length == 5)
    assert(math.abs(total(4)._2 - (4 % 5 + 1) * (4 / 100000.0)) < 1e-12)
    val highValue = spark.sql(
      """SELECT COUNT(*) FROM transactions
        |WHERE some_brand_new_func_classify(quantity, price)""".stripMargin)
      .as[Long].head()
    assert(highValue > 0 && highValue < 1000)
    // system.functions WHERE origin='SQLUserDefined' analogue
    assert(udfs.list.map(_._1).toSet ==
      Set("some_brand_new_func", "some_brand_new_func_classify"))
    udfs.dropFunction("some_brand_new_func")
    assert(!udfs.list.exists(_._1 == "some_brand_new_func"))
  }
}
