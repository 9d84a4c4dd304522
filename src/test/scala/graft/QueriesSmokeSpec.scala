package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must execute and (except known-empty results)
  * return rows at sf0.001 — the fast regression net between full DuckDB
  * oracle runs (tools/oracle_check.py does the value-level checking). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // legitimately empty at sf0.001 (no matching rows in the tiny fixture)
  private val mayBeEmpty = Set("join_anti", "taxi_zone_pair_max",
    "llm_simhash_clusters")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes" + (if (mayBeEmpty(name)) "" else " and returns rows")) {
      val n = fn(spark, TestSession.sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
