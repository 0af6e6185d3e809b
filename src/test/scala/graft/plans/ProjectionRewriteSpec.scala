package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.mergetree.{ProjectionDef, Projections}

class ProjectionRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("aggregate over base table is transparently routed to the projection") {
    val root = Files.createTempDirectory("graft_projrw").toString
    val base = s"$root/base"
    (1 to 10000).map(i => (s"g${i % 7}", s"s${i % 3}", i.toLong))
      .toDF("g", "s", "v").write.parquet(base)

    val p = ProjectionDef("by_g_s", Seq("g", "s"), Seq("v"), s"$root/proj")
    Projections.materialize(spark.read.parquet(base), p)
    ProjectionRouting.register(base, p)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ new ProjectionRewrite(spark)
    try {
      val q = spark.read.parquet(base).groupBy($"g")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      // plan must read the projection, not the base table
      val scans = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }
      val paths = scans.flatMap {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      assert(paths.exists(_.contains("proj")), s"expected projection scan, got $paths")
      assert(!paths.exists(_.endsWith("base")), s"base still scanned: $paths")

      // and results must equal the direct aggregation
      ProjectionRouting.clear()
      val direct = spark.read.parquet(base).groupBy($"g")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .as[(String, Long, Long)].collect().toSet
      ProjectionRouting.register(base, p)
      val routed = q.as[(String, Long, Long)].collect().toSet
      assert(routed == direct)
    } finally {
      ProjectionRouting.clear()
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[ProjectionRewrite])
    }
  }

  test("hw08 projection: sum(quantity*price) + min/max/avg route and match") {
    // homeworks/hw08.md:40-48 — projection over (product_id,
    // sum(quantity), sum(quantity*price)); extended with extrema/avg states
    val root = Files.createTempDirectory("graft_projrw3").toString
    val base = s"$root/base"
    (1 to 20000).map(i =>
        (i % 50L, (i % 7 + 1).toLong, (i % 13 + 1) * 0.5))
      .toDF("product_id", "quantity", "price").write.parquet(base)

    val p = ProjectionDef("by_product", Seq("product_id"), Seq("quantity"),
      s"$root/proj",
      sumExprs = Map("revenue" -> "quantity * price"),
      minCols = Seq("price"), maxCols = Seq("price"), avgCols = Seq("price"))
    Projections.materialize(spark.read.parquet(base), p)
    ProjectionRouting.register(base, p)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ new ProjectionRewrite(spark)
    try {
      def query() = spark.read.parquet(base).groupBy($"product_id")
        .agg(count(lit(1)).as("n"), sum($"quantity").as("sq"),
          sum($"quantity" * $"price").as("revenue"),
          min($"price").as("pmin"), max($"price").as("pmax"),
          avg($"price").as("pavg"))
      val q = query()
      val paths = q.queryExecution.optimizedPlan.collect {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(_.toString)
      }.flatten
      assert(paths.exists(_.contains("proj")), s"expected projection scan, got $paths")
      assert(!paths.exists(_.endsWith("base")), s"base still scanned: $paths")

      val routed = q.collect().map(r => r.getLong(0) -> r).toMap
      ProjectionRouting.clear()
      val direct = query().collect().map(r => r.getLong(0) -> r).toMap
      assert(routed.keySet == direct.keySet)
      routed.keySet.foreach { k =>
        val (r, d) = (routed(k), direct(k))
        assert(r.getLong(1) == d.getLong(1) && r.getLong(2) == d.getLong(2))
        assert(math.abs(r.getDouble(3) - d.getDouble(3)) < 1e-9)   // revenue
        assert(r.getDouble(4) == d.getDouble(4) && r.getDouble(5) == d.getDouble(5))
        assert(math.abs(r.getDouble(6) - d.getDouble(6)) < 1e-12)  // avg
      }
    } finally {
      ProjectionRouting.clear()
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[ProjectionRewrite])
    }
  }

  test("uniqState projection: hll sketch routes and matches EXACTLY (lecture_13)") {
    val root = Files.createTempDirectory("graft_projrw4").toString
    val base = s"$root/base"
    (1 to 30000).map(i => (s"g${i % 5}", (i % 997).toLong))
      .toDF("g", "u").write.parquet(base)

    val p = ProjectionDef("by_g_uniq", Seq("g"), Nil, s"$root/proj",
      uniqCols = Seq("u"))
    Projections.materialize(spark.read.parquet(base), p)
    ProjectionRouting.register(base, p)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ new ProjectionRewrite(spark)
    try {
      def query() = spark.read.parquet(base).groupBy($"g")
        .agg(hll_sketch_estimate(hll_sketch_agg($"u")).as("uniq_u"))
      val q = query()
      val paths = q.queryExecution.optimizedPlan.collect {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(_.toString)
      }.flatten
      assert(paths.exists(_.contains("proj")), s"expected projection scan, got $paths")
      val routed = q.as[(String, Long)].collect().toMap
      ProjectionRouting.clear()
      val direct = query().as[(String, Long)].collect().toMap
      // sketch union is lossless → identical estimates, not just close
      assert(routed == direct)
    } finally {
      ProjectionRouting.clear()
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[ProjectionRewrite])
    }
  }

  test("count(col) routes via the stored non-null count, not the row count") {
    val root = Files.createTempDirectory("graft_projrw5").toString
    val base = s"$root/base"
    // v is null on every 3rd row — count(v) != count(*)
    (1 to 9000).map(i => (s"g${i % 4}",
        if (i % 3 == 0) None else Some(i.toLong)))
      .toDF("g", "v").write.parquet(base)

    val p = ProjectionDef("by_g_cnt", Seq("g"), Nil, s"$root/proj",
      countCols = Seq("v"))
    Projections.materialize(spark.read.parquet(base), p)
    ProjectionRouting.register(base, p)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ new ProjectionRewrite(spark)
    try {
      def query() = spark.read.parquet(base).groupBy($"g")
        .agg(count(lit(1)).as("rows"), count($"v").as("nn"))
      val q = query()
      val paths = q.queryExecution.optimizedPlan.collect {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(_.toString)
      }.flatten
      assert(paths.exists(_.contains("proj")), s"expected projection scan, got $paths")
      val routed = q.as[(String, Long, Long)].collect().toSet
      ProjectionRouting.clear()
      val direct = query().as[(String, Long, Long)].collect().toSet
      assert(routed == direct)
      assert(direct.forall { case (_, rows, nn) => nn < rows }) // nulls real
    } finally {
      ProjectionRouting.clear()
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[ProjectionRewrite])
    }
  }

  test("non-covered aggregates are left untouched") {
    val root = Files.createTempDirectory("graft_projrw2").toString
    val base = s"$root/base"
    (1 to 100).map(i => (s"g${i % 3}", i.toLong, i * 2.0)).toDF("g", "v", "w")
      .write.parquet(base)
    val p = ProjectionDef("by_g", Seq("g"), Seq("v"), s"$root/proj")
    Projections.materialize(spark.read.parquet(base), p)
    ProjectionRouting.register(base, p)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ new ProjectionRewrite(spark)
    try {
      // sum(w) is NOT covered → must read the base table and stay correct
      val q = spark.read.parquet(base).groupBy($"g").agg(sum($"w").as("sw"))
      val paths = q.queryExecution.optimizedPlan.collect {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(_.toString)
      }.flatten
      assert(paths.exists(_.endsWith("base")))
      assert(q.as[(String, Double)].collect().toMap.size == 3)
    } finally {
      ProjectionRouting.clear()
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[ProjectionRewrite])
    }
  }
}
