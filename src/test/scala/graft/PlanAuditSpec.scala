package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Mechanical audit of the plan properties the 100 TB design depends on —
  * the `.explain` review, locked in as assertions so a refactor can't
  * silently regress them: predicate pushdown must reach the parquet scans,
  * scans must prune to referenced columns, and no non-cross query may plan
  * a cartesian product. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    // AdaptiveSparkPlanExec reports no children, so a plain collect stops
    // at the AQE boundary — recurse through its input plan and subqueries
    def go(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          go(a.inputPlan)
        case f: FileSourceScanExec => Seq(f)
        case other => (other.children ++ other.subqueries).flatMap(go)
      }
    go(df.queryExecution.executedPlan)
  }

  private def scanOf(df: DataFrame, table: String): FileSourceScanExec =
    scans(df).find(_.metadata.get("Location").exists(_.contains(table)))
      .getOrElse(fail(s"no parquet scan of $table in plan"))

  test("date-range predicate is pushed into the orders scan") {
    val df = SparkEntry.queries("taxi_top_zones_revenue")(spark, sf)
    val pushed = scanOf(df, "orders").metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("o_orderdate"),
      s"date filter did not reach the scan: $pushed")
  }

  test("equality predicate is pushed into the lineitem scan") {
    val df = SparkEntry.queries("tpch_q10_returns")(spark, sf)
    val pushed = scanOf(df, "lineitem").metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("l_returnflag"),
      s"returnflag filter did not reach the scan: $pushed")
  }

  test("column pruning: pricing summary reads only the six needed columns") {
    val df = SparkEntry.queries("agg_pricing_summary")(spark, sf)
    val read = scanOf(df, "lineitem").schema.fieldNames.toSet
    val needed = Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate")
    assert(read.subsetOf(needed), s"scan reads extra columns: ${read -- needed}")
  }

  test("column pruning: split assignment reads doc_id only") {
    val df = SparkEntry.queries("llm_split_assign")(spark, sf)
    val read = scanOf(df, "documents").schema.fieldNames.toSet
    assert(read == Set("doc_id"), s"scan should read only doc_id, got $read")
  }

  test("no cartesian product in any relational/window/scalar/event query") {
    val audited = SparkEntry.queries.keys.filter { n =>
      (n.startsWith("agg_") || n.startsWith("join_") || n.startsWith("win_") ||
       n.startsWith("fn_") || n.startsWith("set_") || n.startsWith("sub_") ||
       n.startsWith("taxi_") || n.startsWith("evt_") || n.startsWith("tpch_") ||
       n.startsWith("sort_") || n.startsWith("distinct_") ||
       n.startsWith("dedup_")) && n != "join_cross"
    }
    val offenders = audited.filter { n =>
      SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString.contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
