package graft

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
