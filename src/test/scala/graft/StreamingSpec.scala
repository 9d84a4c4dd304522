package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables.t
import graft.streaming.EventStreams

/** Streaming semantics via deterministic file-source replay (SURVEY.md
  * §5.5): batch/streaming unification means the streamed result of each
  * operator must equal its batch twin (which is oracle-checked). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  /** events re-materialized with micros ts so the file streaming source
    * can read it with an explicit schema. */
  lazy val replayDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString + "/events"
    t(spark, sf, "events").write.parquet(dir)
    dir
  }

  test("streamed tumbling counts equal batch tumbling counts") {
    val stream = EventStreams.readEventStream(spark, replayDir)
    EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream), "tumbling",
      org.apache.spark.sql.streaming.OutputMode.Append)
    val streamed = spark.table("tumbling")
    val batch = graft.queries.EventsBatch.defs("evt_tumbling_window")(spark, sf)
    // one AvailableNow replay: all windows are final except possibly those
    // past the watermark frontier; in a single batch ALL rows are emitted
    // only for windows older than (max ts - watermark). Compare on the
    // common set.
    val s = streamed.select("win_start", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val b = batch.select("win_start", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(s.subsetOf(b), "streamed windows must match batch results")
    assert(s.size >= b.size - 10, s"too few emitted windows: ${s.size} vs ${b.size}")
  }

  test("streamed chained window aggregation equals batch (two stateful ops)") {
    val stream = EventStreams.readEventStream(spark, replayDir)
    EventStreams.runToMemory(
      EventStreams.chainedWindowCounts(stream), "chained",
      org.apache.spark.sql.streaming.OutputMode.Append)
    val streamed = spark.table("chained")
    val batch = graft.queries.EventsBatch.defs("evt_chained_windows")(spark, sf)
    val s = streamed.collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val b = batch.collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    // append mode emits only watermark-finalized hours: subset of batch,
    // short of it by at most the unfinalized frontier hour(s)
    assert(s.subsetOf(b), "streamed chained windows must match batch")
    assert(s.size >= b.size - 3, s"too few emitted hours: ${s.size} vs ${b.size}")
  }

  test("complete and update output modes; parquet sink with AvailableNow") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // complete mode: every trigger re-emits the full aggregate
    val agg = EventStreams.readEventStream(spark, replayDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val qc = agg.writeStream.format("memory").queryName("complete_out")
      .outputMode(OutputMode.Complete).start()
    qc.processAllAvailable(); qc.stop()
    val complete = spark.table("complete_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = t(spark, sf, "events").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(complete == batch)

    // parquet file sink driven by Trigger.AvailableNow (checkpointed)
    val outDir = java.nio.file.Files.createTempDirectory("graft-psink")
    val qp = EventStreams.tumblingCounts(
        EventStreams.readEventStream(spark, replayDir))
      .writeStream.format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    qp.awaitTermination(60000)
    val written = spark.read.parquet(s"$outDir/data")
    assert(written.count() > 0)
    assert(written.columns.toSet ==
      Set("win_start", "event_type", "n", "sum_value"))
  }

  test("rate source produces a monotonically timestamped stream") {
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
    val q = rate.writeStream.format("memory").queryName("rate_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Thread.sleep(1100)
      q.processAllAvailable()
      val rows = spark.table("rate_out")
        .orderBy("value").collect()
      assert(rows.nonEmpty)
      val values = rows.map(_.getLong(1))
      assert(values.toSeq == values.sorted.toSeq)
      assert(values.distinct.length == values.length)
    } finally q.stop()
  }

  test("stateful dedup drops re-delivered events") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dup").toString + "/in"
    val ev = t(spark, sf, "events").limit(100)
    ev.write.parquet(dir)
    ev.write.mode("append").parquet(dir) // duplicate delivery
    val stream = EventStreams.readEventStream(spark, dir)
    EventStreams.runToMemory(EventStreams.dedupStream(stream), "deduped")
    assert(spark.table("deduped").count() == 100)
  }

  test("stream-static broadcast enrichment") {
    import spark.implicits._
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0),
      ("signup", 3.0), ("error", -1.0)).toDF("event_type", "weight")
    val stream = EventStreams.readEventStream(spark, replayDir)
    EventStreams.runToMemory(EventStreams.enrich(stream, dim), "enriched")
    val got = spark.table("enriched")
    assert(got.count() == t(spark, sf, "events").count())
    assert(got.filter(col("weight").isNull).count() == 0)
  }

  test("stream-stream join with watermarks equals the oracle-checked batch twin") {
    // two independent streaming inputs from the same replay dir; the join
    // carries both-side watermarks + a 1h event-time bound (state eviction)
    val clicks = EventStreams.readEventStream(spark, replayDir)
      .filter(col("event_type") === "click")
    val purchases = EventStreams.readEventStream(spark, replayDir)
      .filter(col("event_type") === "purchase")
    EventStreams.runToMemory(
      EventStreams.attributeClicks(clicks, purchases), "attributed")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = key(spark.table("attributed"))
    val batch = key(graft.queries.EventsBatch.defs("evt_stream_join")(spark, sf))
    // inner stream-stream join emits every match in the single AvailableNow
    // batch (watermarks only bound STATE, not inner-join emission) → exact
    assert(streamed == batch,
      s"streamed ${streamed.size} pairs != batch ${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("update mode re-emits a group's revised aggregate each micro-batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upd").toString + "/in"
    def write(ids: Seq[Long]) = ids
      .map(i => (i, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L,
        "click", 1.0, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(dir)
    write(Seq(1L, 2L))
    val agg = EventStreams.readEventStream(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("upd_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update).start()
    q.processAllAvailable()
    write(Seq(3L))
    q.processAllAvailable()
    q.stop()
    // update mode: the click group is re-emitted with its revised count —
    // both the n=2 and the n=3 versions land in the append-only sink
    val ns = spark.table("upd_out").filter(col("event_type") === "click")
      .select("n").collect().map(_.getLong(0)).sorted.toSeq
    assert(ns == Seq(2L, 3L), s"expected revisions [2, 3], got $ns")
  }

  test("two-batch replay: watermark finalizes windows once and drops late data") {
    import spark.implicits._
    def ev(id: Long, hhmm: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), 1L, "click", v,
        """{"k": 1}""")
    val dir = Files.createTempDirectory("graft-late").toString + "/in"
    def write(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
    // batch 1: one event per hour 00..05; max ts 05:30 → watermark 05:20
    write((0 to 5).map(h => ev(h, f"$h%02d:30", 1.0)))
    val q = EventStreams.tumblingCounts(
        EventStreams.readEventStream(spark, dir))
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("late_demo").start()
    q.processAllAvailable()
    // batch 2: a LATE event in hour 00 (far past the 10 min watermark —
    // must be dropped) plus a fresh hour-06 event advancing the watermark
    write(Seq(ev(100, "00:40", 1.0), ev(101, "06:30", 1.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_demo")
      .select("win_start", "n").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    // append mode: every finalized window emitted exactly once
    assert(rows.map(_._1).distinct.length == rows.length,
      s"window re-emitted: ${rows.toSeq}")
    val h0 = rows.find(_._1.startsWith("2024-01-01 00:00"))
    assert(h0.exists(_._2 == 1L),
      s"late hour-00 event must be dropped, got $h0 in ${rows.toSeq}")
    // hour-05 window finalizes once the hour-06 event advances the watermark
    assert(rows.exists(_._1.startsWith("2024-01-01 05:00")),
      s"hour-05 window should be finalized by batch 2: ${rows.toSeq}")
  }

  test("foreachBatch sink: stream lands in JDBC exactly once per batch") {
    import org.apache.spark.sql.streaming.Trigger
    val url =
      s"jdbc:derby:${Files.createTempDirectory("graft-fb")}/db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val ckpt = Files.createTempDirectory("graft-fb-ckpt").toString
    val stream = EventStreams.readEventStream(spark, replayDir)
      .filter(col("event_type") === "signup")
      .select("event_id", "user_id", "value")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.etl.Writers.appendJdbc(batch, url, "signups_jdbc", props)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val back = spark.read.jdbc(url, "signups_jdbc", props)
    val want = t(spark, sf, "events").filter(col("event_type") === "signup")
    assert(back.count() == want.count())
    assert(math.abs(back.agg(sum("value")).collect()(0).getDouble(0) -
      want.agg(sum("value")).collect()(0).getDouble(0)) < 1e-6)
  }

  test("foreachBatch + mergeUpsert: streaming CDC apply keeps one row per key") {
    import org.apache.spark.sql.streaming.Trigger
    // the streaming upsert sink: each micro-batch's per-user totals are
    // MERGED into a keyed parquet table (Writers.mergeUpsert), so the
    // table holds exactly one current row per user however many batches
    // replayed — the CDC-apply pattern over a plain parquet warehouse
    val target = Files.createTempDirectory("graft-ups").toString + "/totals"
    val ckpt = Files.createTempDirectory("graft-ups-ckpt").toString
    val stream = EventStreams.readEventStream(spark, replayDir)
      .select("user_id", "value")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = batch.groupBy("user_id")
          .agg(sum("value").as("total"), count(lit(1)).as("n"))
        val merged =
          if (new java.io.File(target).exists()) {
            val cur = spark.read.parquet(target)
            // additive merge: combine the existing row with the delta,
            // then upsert the combined rows by key
            val combined = cur.join(delta, Seq("user_id"), "inner")
              .select(col("user_id"),
                (cur("total") + delta("total")).as("total"),
                (cur("n") + delta("n")).as("n"))
              .unionByName(delta.join(cur, Seq("user_id"), "left_anti"))
            graft.etl.Writers.mergeUpsert(cur, combined, Seq("user_id"))
          } else delta
        // localCheckpoint breaks the lineage onto the files being replaced
        graft.etl.Writers.writeDimension(merged.localCheckpoint(), target)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val back = spark.read.parquet(target)
    val want = t(spark, sf, "events").groupBy("user_id")
      .agg(sum("value").as("total"), count(lit(1)).as("n"))
    assert(back.count() == want.count(), "one row per user")
    val diff = back.as("b").join(want.as("w"), "user_id")
      .filter(abs(col("b.total") - col("w.total")) > 1e-6 ||
        col("b.n") =!= col("w.n"))
    assert(diff.isEmpty, "merged totals must equal the batch ground truth")
  }

  test("left-outer stream-stream join: matches exact, null-extension watermark-gated") {
    val clicks = EventStreams.readEventStream(spark, replayDir)
      .filter(col("event_type") === "click")
    val purchases = EventStreams.readEventStream(spark, replayDir)
      .filter(col("event_type") === "purchase")
    EventStreams.runToMemory(
      EventStreams.attributeClicks(clicks, purchases, "left_outer"), "attr_left")
    val streamed = spark.table("attr_left")
    val batch = graft.queries.EventsBatch.defs("evt_stream_join_left")(spark, sf)
    def matched(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("click_id").isNotNull)
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // matched rows are exact (inner-path semantics)
    assert(matched(streamed) == matched(batch))
    // null-extended rows: a subset of the batch ones — streaming may only
    // declare "no click" for purchases whose match window is fully past the
    // click watermark, and the final watermark's stragglers stay in state
    def unmatched(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("click_id").isNull).select("purchase_id").collect()
        .map(_.getLong(0)).toSet
    assert(unmatched(streamed).subsetOf(unmatched(batch)))
    assert(streamed.count() >= matched(batch).size)
  }

  test("streamed seq gate emits exactly the batch evt_frequent_seq2 support") {
    import spark.implicits._
    val src = EventStreams.readEventStream(spark, replayDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Ev]
    EventStreams.runToMemory(EventStreams.seqGate(src).toDF(), "seq_gate")
    val triples = spark.table("seq_gate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // each (user, a, b) emitted at most once
    assert(triples.distinct.length == triples.length)
    val got = triples.groupBy(t => (t._2, t._3))
      .map { case (k, v) => k -> v.length.toLong }
    val want = graft.queries.EventsBatch.defs("evt_frequent_seq2")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, s"streamed support ${got.size} pairs vs ${want.size}")
  }

  test("flatMapGroupsWithState sessionization closes gap-separated sessions") {
    import spark.implicits._
    // batch-mode execution of the stateful function: every session CLOSED
    // by a ≥30min gap inside the data is emitted; the trailing open session
    // per user is retained in (discarded) state, not emitted
    val ev = t(spark, sf, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Ev]
    val out = EventStreams.sessionize(ev).collect()
    val batchSessions = graft.queries.EventsBatch.defs("evt_session_window")(spark, sf)
    val expected = batchSessions.count() -
      batchSessions.select("user_id").distinct().count() // minus open tails
    assert(out.length == expected,
      s"closed sessions ${out.length} != gaps-and-islands minus tails $expected")
    assert(out.forall(s => s.n_events > 0 && s.user_id >= 0))
  }

  test("event-time sessionization closes sessions as the watermark passes") {
    import spark.implicits._
    val src = EventStreams.readEventStream(spark, replayDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Ev]
    EventStreams.runToMemory(
      EventStreams.sessionizeEventTime(src).toDF(), "et_sessions")
    val out = spark.table("et_sessions")
    // sessions closed by an in-data gap are emitted; per-user trailing
    // sessions may close too once the final watermark passes them — so the
    // count sits between the gap-closed floor and the batch total
    val batchSessions = graft.queries.EventsBatch.defs("evt_session_window")(spark, sf)
    val floor = batchSessions.count() -
      batchSessions.select("user_id").distinct().count()
    assert(out.count() >= floor, s"${out.count()} < gap-closed floor $floor")
    assert(out.count() <= batchSessions.count())
    // every closed session matches a batch gaps-and-islands session exactly
    val got = out.select("user_id", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    val want = batchSessions
      .select("user_id", "n_events", "session_value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    assert(got.subsetOf(want), s"phantom sessions: ${got -- want}")
  }

  test("streamed threshold alerts equal the batch twin exactly (stateless gate)") {
    val stream = EventStreams.readEventStream(spark, replayDir)
    val baseline = EventStreams.typeBaseline(t(spark, sf, "events"))
      .localCheckpoint()
    EventStreams.runToMemory(
      EventStreams.thresholdAlerts(stream, baseline), "alerts_out")
    val streamed = spark.table("alerts_out").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(3) * 1e9))).toSet
    val batch = graft.queries.EventsBatch.defs("evt_threshold_alerts")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(3) * 1e9))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} alerts != batch ${batch.size}")
  }

  test("transformWithState MapState per-type counts equal batch aggregates") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = EventStreams.readEventStream(spark, replayDir)
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Ev]
      EventStreams.runToMemory(EventStreams.typeCounts(src).toDF(), "tws_types")
      // append mode re-emits a (user, type) row per touching batch with the
      // RUNNING count — the max per pair is the final count
      val got = spark.table("tws_types")
        .groupBy("user_id", "event_type").agg(max("n").as("n"))
        .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
      val want = t(spark, sf, "events").groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
      assert(got == want)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState ListState rolling trail equals batch window collect") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = EventStreams.readEventStream(spark, replayDir)
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Ev]
      EventStreams.runToMemory(EventStreams.recentEvents(src).toDF(), "tws_recent")
      val got = spark.table("tws_recent")
        .select("user_id", "ts", "recent").collect()
        .map(r => ((r.getLong(0), r.getTimestamp(1)), r.getString(2))).toMap
      // batch twin: last-3 trail via a rows-frame window collect
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
        .rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
      val want = t(spark, sf, "events")
        .withColumn("code", upper(substring(col("event_type"), 1, 1)))
        .withColumn("recent",
          concat_ws(",", collect_list(col("code")).over(w)))
        .select("user_id", "ts", "recent").collect()
        .map(r => ((r.getLong(0), r.getTimestamp(1)), r.getString(2))).toMap
      assert(got.size == want.size)
      assert(got == want)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState running totals equal batch per-user aggregates") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = EventStreams.readEventStream(spark, replayDir)
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Ev]
      EventStreams.runToMemory(EventStreams.runningTotals(src).toDF(), "tws_totals")
      // one replayed micro-batch → one emission per user holding final totals
      val got = spark.table("tws_totals")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      val want = t(spark, sf, "events").groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("v"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (u, (n, v)) =>
        assert(got(u)._1 == n && math.abs(got(u)._2 - v) < 1e-6, s"user $u") }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("cusum gate: streamed across micro-batches equals the batch query") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // daily per-type counts from the batch table, and the SAME-data
      // target — under which the gate must reproduce evt_cusum exactly
      val daily = t(spark, sf, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val target = EventStreams.cusumTarget(daily)
      val rows = daily.as[EventStreams.DailyCount].collect()
        .sortBy(_.day.getTime)
      val src = MemoryStream[EventStreams.DailyCount](spark)
      val gated = EventStreams.cusumGate(src.toDS(), target)
      val q = gated.toDF().writeStream.outputMode("append")
        .format("memory").queryName("cusum_gate").start()
      try {
        // three micro-batches split on day boundaries → state must carry
        // cum and min-prefix across batch boundaries to stay ≡ batch
        rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
          src.addData(chunk.toIndexedSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table("cusum_gate")
        .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
          (r.getDouble(3), r.getBoolean(4))).toMap
      val want = SparkEntry.queries("evt_cusum")(spark, sf)
        .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
          (r.getDouble(3), r.getBoolean(4))).toMap
      assert(got.keySet == want.keySet)
      want.foreach { case (k, (c, a)) =>
        assert(math.abs(got(k)._1 - c) < 1e-3, s"cusum mismatch at $k")
        assert(got(k)._2 == a, s"alarm mismatch at $k")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState timers fire inactivity alerts for quiet users") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val prevProv = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // few partitions = few RocksDB instances per (frequent) timer batch
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val src = MemoryStream[EventStreams.Ev](spark)
      val alerts = EventStreams.inactivityAlerts(src.toDS(), quietMs = 500L)
      val q = alerts.toDF().writeStream.outputMode("append")
        .format("memory").queryName("quiet_alerts").start()
      def ev(id: Long, uid: Long) = EventStreams.Ev(id,
        new java.sql.Timestamp(1700000000000L + id), uid, "click", 1.0)
      try {
        // users 1 (two events) and 2 (one event) — timers armed. NOTE: with
        // ProcessingTime TimeMode the engine keeps scheduling batches while
        // timers are pending, so processAllAvailable() would NEVER return
        // (shouldRunAnotherBatch stays true) — poll the sink instead.
        src.addData(ev(1, 1), ev(2, 1), ev(3, 2))
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        def alertsNow() = spark.table("quiet_alerts")
          .select("user_id", "n_events").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        var got = alertsNow()
        while (got.size < 2 && System.nanoTime() < deadline) {
          Thread.sleep(250)
          q.exception.foreach(e => fail(s"query failed: $e"))
          got = alertsNow()
        }
        // both users went quiet past 500ms → exactly one alert each,
        // carrying the per-user event counts accumulated in state
        assert(got == Map(1L -> 2L, 2L -> 1L),
          s"expected quiet alerts for users 1 and 2, got $got")
      } finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevProv match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("checkpoint recovery: a restarted query resumes offsets AND state") {
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // the exactly-once restart contract: a NEW query object pointed at the
    // SAME checkpoint must (a) skip files already committed (offset log
    // recovered), and (b) keep aggregating into the pre-restart totals
    // (state store recovered). Update-mode output makes both observable:
    // run 2 must emit ONLY the group touched by the new file, with its
    // cumulative — not restarted — aggregate.
    val base = Files.createTempDirectory("graft-ckpt").toString
    val src = s"$base/src"; val ckpt = s"$base/ckpt"
    val emitted =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("user_id BIGINT, v BIGINT").parquet(src)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = df.collect()
          emitted.synchronized { rows.foreach(r => emitted +=
            ((id, r.getLong(0), r.getLong(1), r.getLong(2)))) }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000); q.stop()
      q.exception.foreach(e => fail(s"query failed: $e"))
    }
    Seq((1L, 10L), (2L, 20L)).toDF("user_id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce()
    val run1 = emitted.toList
    assert(run1.map(t => (t._2, t._3, t._4)).toSet ==
      Set((1L, 1L, 10L), (2L, 1L, 20L)), s"run 1 emitted $run1")

    emitted.clear()
    Seq((1L, 5L)).toDF("user_id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce() // brand-new query instance, same checkpoint
    val run2 = emitted.toList
    // user 1: count jumped 1→2 (state recovered, file 1 NOT re-read —
    // a from-scratch rerun would emit n=1 for a fresh state or re-emit
    // user 2 if the first file were reprocessed)
    assert(run2.map(t => (t._2, t._3, t._4)) == List((1L, 2L, 15L)),
      s"run 2 emitted $run2")
    // batch ids continue the recovered write-ahead log, not restart at 0
    assert(run2.head._1 > run1.map(_._1).max,
      s"batch id did not advance across restart: $run1 → $run2")
  }

  test("session windows via session_window: streamed subset of batch") {
    val stream = EventStreams.readEventStream(spark, replayDir)
    EventStreams.runToMemory(EventStreams.sessionAgg(stream), "sessions")
    val streamed = spark.table("sessions")
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = graft.queries.EventsBatch.defs("evt_session_window")(spark, sf)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed.subsetOf(batch))
    assert(streamed.nonEmpty)
  }
}
