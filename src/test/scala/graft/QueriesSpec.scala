package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level integration: every declared query runs on sf0.001 and returns
  * rows; every oracle entry points at a declared query. (Exact value parity
  * vs DuckDB is checked by graft.Verify + scripts/local_check.py — DuckDB
  * is not a JVM dependency.)
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"query $name runs and returns rows on sf0.001") {
      assert(SparkEntry.queries(name)(spark, dir).count() > 0)
    }
  }
}
