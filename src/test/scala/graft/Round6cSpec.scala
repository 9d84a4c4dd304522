package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Edge semantics of the round-6 session-3 operators, exercised through
  * the REGISTERED queries over crafted fixtures (the driver read path):
  * EWMA recursion values, attribution credit splits, snapshot-diff
  * classification, sliding-distinct window membership, and WITH TIES
  * cutoff behavior. The DuckDB oracle checks these at corpus scale; here
  * the expected numbers are hand-computed.
  */
class Round6cSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-r6c").toString

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

  private def writeOrders(dir: String, rows: Seq[Row]): Unit = {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderpriority", StringType),
      StructField("o_totalprice", DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  private def ns(sec: Long): Long = sec * 1000000000L

  test("ewma: fold reproduces the adjusted-EWMA recursion exactly") {
    val dir = tmpDir()
    // user 1: values 10, 20, 30 → adjusted EWMA (α=0.2):
    //   e1 = 10
    //   e2 = (0.8·10 + 20) / (0.8 + 1)            = 15.555556
    //   e3 = (0.64·10 + 0.8·20 + 30) / (0.64+0.8+1) = 21.311475
    writeEvents(dir, Seq(
      Row(1L, ns(10), 1L, "view", 10.0, "{}"),
      Row(2L, ns(20), 1L, "view", 20.0, "{}"),
      Row(3L, ns(30), 1L, "view", 30.0, "{}")))
    val got = SparkEntry.queries("evt_ewma")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 10.0)
    assert(math.abs(got(2L) - 28.0 / 1.8) < 1e-6)
    assert(math.abs(got(3L) - (0.64 * 10 + 0.8 * 20 + 30) / 2.44) < 1e-6)
  }

  test("attribution: credit splits across in-window clicks; no-click purchase drops") {
    val dir = tmpDir()
    // user 1: clicks at 100s and 200s, purchase at 300s → both in the 1h
    // window, 0.5 credit each. Click at 300s (== purchase ts) excluded
    // (strict <). user 2: purchase with no clicks → contributes nothing.
    // user 3: one click at 10s serving TWO purchases → 1.0 + 1.0 credit.
    writeEvents(dir, Seq(
      Row(1L, ns(100), 1L, "click", 1.0, "{}"),
      Row(2L, ns(200), 1L, "click", 1.0, "{}"),
      Row(3L, ns(300), 1L, "click", 1.0, "{}"),
      Row(4L, ns(300), 1L, "purchase", 9.0, "{}"),
      Row(5L, ns(50), 2L, "purchase", 9.0, "{}"),
      Row(6L, ns(10), 3L, "click", 1.0, "{}"),
      Row(7L, ns(20), 3L, "purchase", 9.0, "{}"),
      Row(8L, ns(30), 3L, "purchase", 9.0, "{}")))
    val got = SparkEntry.queries("evt_attribution")(spark, dir).collect()
    // all fixture events land in hour 0 → one output row
    assert(got.length == 1)
    val r = got.head
    assert(r.getInt(0) == 0)
    // credits: user1 0.5+0.5 + user3 1.0+1.0 = 3.0 over 4 touch rows
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-9)
    assert(r.getLong(2) == 4L)
  }

  test("snapshot diff: delete/update/insert classify; untouched rows drop") {
    val dir = tmpDir()
    writeOrders(dir, Seq(
      Row(97L, "1-URGENT", 100.0),  // 97 % 97 == 0  → delete
      Row(104L, "1-URGENT", 200.0), // 104 % 101 == 3 → update (×1.1)
      Row(108L, "1-URGENT", 300.0), // 108 % 103 == 5 → ALSO insert copy
      Row(1L, "1-URGENT", 400.0)))  // untouched → absent from the diff
    val got = SparkEntry.queries("etl_snapshot_diff")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (97L, "delete"), (104L, "update"), (10000108L, "insert")))
  }

  test("rolling distinct: a user counts once per trailing window it spans") {
    val dir = tmpDir()
    // hour 0: users {1, 2}; hour 1: {2}; hour 30: {3} (outside 24h of
    // hours 0-1). Expected: h0 → 2, h1 → 2 (1 and 2 both within 24h),
    // h30 → 1 (trail from h0/h1 expired).
    writeEvents(dir, Seq(
      Row(1L, ns(100), 1L, "view", 1.0, "{}"),
      Row(2L, ns(200), 2L, "view", 1.0, "{}"),
      Row(3L, ns(3700), 2L, "view", 1.0, "{}"),
      Row(4L, ns(30 * 3600 + 5), 3L, "view", 1.0, "{}")))
    val got = SparkEntry.queries("evt_rolling_distinct")(spark, dir)
      .collect().map(r => r.getTimestamp(0).getTime / 3600000 -> r.getLong(1))
      .toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 30L -> 1L))
  }

  test("top-k with ties keeps every row tied at the cutoff") {
    val dir = tmpDir()
    writeOrders(dir, Seq(
      Row(1L, "P", 500.0), Row(2L, "P", 400.0),
      Row(3L, "P", 300.0), Row(4L, "P", 300.0), // tie AT rank 3
      Row(5L, "P", 200.0)))                     // below the cutoff
    val got = SparkEntry.queries("win_topk_ties")(spark, dir)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 2L, 3L, 4L), "both rank-3 ties must survive")
  }

  test("incremental agg matches a direct recompute on a key-split fixture") {
    // fixture-free: run on sf0.001 and recompute the oracle in-process
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("etl_incremental_agg")(spark, sf)
    val direct = graft.core.Tables.t(spark, sf, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
    val merged = got.select("o_orderpriority", "n_orders", "total_price")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    direct.collect().foreach { r =>
      val (n, tot) = merged(r.getString(0))
      assert(n == r.getLong(1))
      assert(math.abs(tot - r.getDouble(2)) < 1e-6)
    }
  }
}
