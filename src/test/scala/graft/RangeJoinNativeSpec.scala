package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{BroadcastRangeJoinExec, RangeNative}

/** The native broadcast range join (sorted starts + prefix-max ends,
  * binary-search probes) against the bucket-composed IntervalJoin the
  * DuckDB oracle already hash-checks — plus plan-shape and boundary
  * assertions the oracle can't express. */
class RangeJoinNativeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def collectExec(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: collectExec(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: collectExec(q.plan)
    case other => p +: (other.children ++ other.subqueries).flatMap(collectExec)
  }

  private def intervals() = graft.core.Tables.t(spark, sf, "events")
    .filter(col("event_type") === "signup")
    .select(col("event_id").as("iv_id"), col("ts").as("iv_start"),
      (col("ts") + expr("interval 90 minutes")).as("iv_end"))

  private def points() = graft.core.Tables.t(spark, sf, "events")
    .filter(col("event_type") === "click")
    .select(col("event_id").as("pt_id"), col("ts"))

  test("native range join equals the bucket-composed IntervalJoin") {
    val native = RangeNative.joinRangeNative(points(), intervals(),
      "ts", "iv_start", "iv_end")
      .select(col("pt_id"), col("iv_id"))
    val composed = graft.ops.IntervalJoin.joinPointInInterval(
      points(), intervals(), "ts", "iv_start", "iv_end")
      .select(col("pt_id"), col("iv_id"))
    assert(native.count() == composed.count())
    assert(native.exceptAll(composed).isEmpty)
    assert(composed.exceptAll(native).isEmpty)
  }

  test("plan contains BroadcastRangeJoinExec and no nested loop") {
    val df = RangeNative.joinRangeNative(points(), intervals(),
      "ts", "iv_start", "iv_end")
    df.collect()
    val nodes = collectExec(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastRangeJoinExec]),
      "native exec node missing from the plan")
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "nested loop crept back in")
  }

  test("half-open boundary: start inclusive, end exclusive; empty drops") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val pts = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start → match
      (2L, ts("2024-01-01 11:00:00")), // == end → NO match
      (3L, ts("2024-01-01 10:30:00")), // inside → match
      (4L, ts("2024-01-01 09:59:59"))  // before → NO match
    ).toDF("pt_id", "ts")
    val ivs = Seq(
      (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (11L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00")) // empty
    ).toDF("iv_id", "iv_start", "iv_end")
    val got = RangeNative.joinRangeNative(pts, ivs,
      "ts", "iv_start", "iv_end")
      .select(col("pt_id"), col("iv_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (3L, 10L)))
  }

  test("overlapping intervals each match; nulls never match") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val pts = Seq((1L, ts("2024-01-01 10:30:00")),
      (2L, null.asInstanceOf[Timestamp])).toDF("pt_id", "ts")
    val ivs = Seq(
      (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (11L, ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00")),
      (12L, ts("2024-01-01 10:29:00"), ts("2024-01-01 10:31:00")),
      (13L, null.asInstanceOf[Timestamp], ts("2024-01-01 23:00:00")))
      .toDF("iv_id", "iv_start", "iv_end")
    val got = RangeNative.joinRangeNative(pts, ivs,
      "ts", "iv_start", "iv_end")
      .select(col("pt_id"), col("iv_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (1L, 12L)))
  }
}
