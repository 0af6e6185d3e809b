package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.queries.Registry

/** Every registry query runs at sf0.001 and yields a well-formed result.
  * (Value-level correctness is the driver's DuckDB gate — mirrored locally
  * by scripts/oracle_check.py; this spec catches analysis/runtime breaks.)
  */
class QueriesSmokeSpec extends SparkSpec {
  Registry.all.foreach { q =>
    test(s"${q.name} runs") {
      val df = q.fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      // Driver compat: the driver's comparator sorts result rows in pandas
      // (sort_values), which raises on array/map/struct cells. Every
      // DECLARED board output must be scalar-only — operators keep their
      // array-typed APIs; boards serialize (Q.scalarize / concat_ws).
      val nonScalar = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.sql}"
      }
      assert(nonScalar.isEmpty,
        s"${q.name} emits non-scalar driver-visible columns: " +
          nonScalar.mkString(", "))
      assert(df.count() >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
