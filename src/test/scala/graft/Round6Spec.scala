package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Edge semantics of the round-6 operator additions, exercised through the
  * REGISTERED queries over crafted parquet fixtures (the driver read path,
  * including Tables.t's ns→µs events narrowing): interpolation edge fill,
  * streak islands across gaps, HLL-union dedup across sources, and the
  * recursive-CTE zero-filled calendar tail.
  */
class Round6Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-r6").toString

  private def writeEvents(dir: String, rows: Seq[Row]): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType), // nanos; Tables.t narrows to micros
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("interp: edges take the nearest known; interior lerps by time fraction") {
    val dir = tmpDir()
    def ns(sec: Long): Long = sec * 1000000000L
    // event_id % 3 == 0 marks knowns. user 1: leading unknown (id 1),
    // known 10 @10s (id 0), interior unknown @20s (id 2), known 40 @40s
    // (id 3), trailing unknown @50s (id 4). user 2: NO knowns at all.
    writeEvents(dir, Seq(
      Row(1L, ns(0L), 1L, "e", 99.0, "{}"),
      Row(0L, ns(10L), 1L, "e", 10.0, "{}"),
      Row(2L, ns(20L), 1L, "e", 99.0, "{}"),
      Row(3L, ns(40L), 1L, "e", 40.0, "{}"),
      Row(4L, ns(50L), 1L, "e", 99.0, "{}"),
      Row(5L, ns(5L), 2L, "e", 99.0, "{}"),
      Row(7L, ns(15L), 2L, "e", 99.0, "{}")))
    val out = SparkEntry.queries("evt_interp_linear")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L).contains(10.0), "before first known → nearest next")
    assert(out(0L).contains(10.0), "known rows keep their value")
    // (20−10)/(40−10) = 1/3 of the way from 10 to 40
    assert(out(2L).contains(20.0), s"interior lerp, got ${out(2L)}")
    assert(out(3L).contains(40.0))
    assert(out(4L).contains(40.0), "after last known → nearest previous")
    assert(out(5L).isEmpty && out(7L).isEmpty,
      "a user with no knowns interpolates to NULL")
  }

  test("streaks: islands split on calendar gaps; same-day repeats collapse") {
    val dir = tmpDir()
    def day(d: Int, sec: Int = 0): Long = (d * 86400L + sec) * 1000000000L
    // user 10 active on days 1,2,3 | 5,6 | 9 (two events on day 2)
    writeEvents(dir, Seq(
      Row(0L, day(1), 10L, "e", 0.0, "{}"),
      Row(1L, day(2), 10L, "e", 0.0, "{}"),
      Row(2L, day(2, 3600), 10L, "e", 0.0, "{}"),
      Row(3L, day(3), 10L, "e", 0.0, "{}"),
      Row(4L, day(5), 10L, "e", 0.0, "{}"),
      Row(5L, day(6), 10L, "e", 0.0, "{}"),
      Row(6L, day(9), 10L, "e", 0.0, "{}")))
    val r = SparkEntry.queries("win_streaks")(spark, dir).collect()
    assert(r.length == 1)
    val (maxStreak, nStreaks, activeDays) =
      (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(maxStreak == 3L, s"longest run is days 1-3, got $maxStreak")
    assert(nStreaks == 3L, s"three islands, got $nStreaks")
    assert(activeDays == 6L, s"six distinct days, got $activeDays")
  }

  test("hll union: merged per-source sketches hit the per-lang distinct") {
    val dir = tmpDir()
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    // 3 sources × 200 disjoint docs (the fixture invariant the query's
    // exact side documents: doc_id is globally unique)
    val rows = for (s <- 0 until 3; i <- 0 until 200) yield
      Row(s * 200L + i, "t", "en", s"s$s", 1L)
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("agg_hll_union")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 600L, "exact distinct across sources")
    assert(r(0).getLong(2) == 3L)
    assert(r(0).getBoolean(3), "union estimate must sit in the 5% band")
    // and the union genuinely DEDUPLICATES: two overlapping id sets
    // (0..399, 200..599) union to ~600, not the concatenated 800
    import spark.implicits._
    spark.range(0, 400).map(i => (i, "a")).toDF("id", "src")
      .union(spark.range(200, 600).map(i => (i, "b")).toDF("id", "src"))
      .createOrReplaceTempView("r6_hll_overlap")
    val est = spark.sql(
      """SELECT hll_sketch_estimate(hll_union_agg(sk)) FROM (
           SELECT src, hll_sketch_agg(id) AS sk
           FROM r6_hll_overlap GROUP BY src)""").head().getLong(0)
    assert(math.abs(est - 600L) <= 30L,
      s"overlapping sketches must merge to ~600 distinct, got $est")
  }

  test("recursive cte: full 24-month spine with a zero-filled tail") {
    val rows = SparkEntry.queries("sub_recursive_cte")(spark, TestSession.sf)
      .collect()
    assert(rows.length == 24, s"24 calendar months, got ${rows.length}")
    val gaps = rows.filter(_.getBoolean(3))
    assert(gaps.nonEmpty, "fixture orders end 2001-08: tail must be gaps")
    assert(gaps.forall(r => r.getLong(1) == 0L && r.getDouble(2) == 0.0),
      "gap months must zero-fill both measures")
    assert(rows.filter(!_.getBoolean(3)).forall(_.getLong(1) > 0L))
  }
}
