package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SpatialGrid

/** Edge semantics of the round-6d operators: grid-blocked spatial radius
  * join (boundary cases the corpus can't be trusted to contain), CUSUM's
  * closed form vs the textbook recursion, the dependence screens
  * (chi²/MI/WOE) and their cross-query consistency, the temporal-split
  * leakage audit, and PMI collocations replayed from first principles.
  * The DuckDB oracle already value-checks every query on the real data;
  * these tests pin the crafted cases and internal invariants.
  */
class Round6dSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- SpatialGrid ---------------------------------------------------

  test("spatial grid: blocked join equals brute force incl. boundaries") {
    import spark.implicits._
    // crafted plane, r = 10: pairs straddling a cell boundary (9,0)-(11,0),
    // an exactly-at-r pair (100,100)-(110,100), a diagonal just-inside pair,
    // a just-outside pair, negative coordinates straddling cell -1/0, and
    // an isolated far point.
    val pts = Seq(
      (1L, 9L, 0L), (2L, 11L, 0L),       // boundary straddle, d=2
      (3L, 100L, 100L), (4L, 110L, 100L), // d = r exactly
      (5L, 200L, 200L), (6L, 207L, 207L), // diagonal d²=98 ≤ 100
      (7L, 300L, 300L), (8L, 307L, 308L), // diagonal d²=113 > 100
      (9L, -3L, -3L), (10L, 4L, 4L),      // negative coords, d²=98
      (11L, 1000L, 1000L)                 // isolated
    ).toDF("k", "xi", "yi")
    val got = SpatialGrid.radiusSelfJoin(pts, 10L)
      .select("k1", "k2", "d2").as[(Long, Long, Long)].collect().toSet
    // brute force on the fixture
    val raw = Seq((1L, 9L, 0L), (2L, 11L, 0L), (3L, 100L, 100L),
      (4L, 110L, 100L), (5L, 200L, 200L), (6L, 207L, 207L),
      (7L, 300L, 300L), (8L, 307L, 308L), (9L, -3L, -3L), (10L, 4L, 4L),
      (11L, 1000L, 1000L))
    val want = (for {
      (k1, x1, y1) <- raw; (k2, x2, y2) <- raw if k1 < k2
      d2 = (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) if d2 <= 100
    } yield (k1, k2, d2)).toSet
    assert(want == Set((1L, 2L, 4L), (3L, 4L, 100L), (5L, 6L, 98L),
      (9L, 10L, 98L), (1L, 10L, 41L), (2L, 10L, 65L)), "fixture self-check")
    assert(got == want)
  }

  test("spatial grid: each qualifying pair is emitted exactly once") {
    import spark.implicits._
    // a dense clump inside ONE cell plus its 8 neighbors all occupied —
    // the explode side offers 9 chances to collide; dedup-free blocking
    // must still emit each pair once.
    val pts = (0 until 12).map(i => (i.toLong, (i % 4) * 3L, (i / 4) * 3L))
      .toDF("k", "xi", "yi")
    val out = SpatialGrid.radiusSelfJoin(pts, 10L)
      .groupBy(col("k1"), col("k2")).count()
      .filter(col("count") > 1).count()
    assert(out == 0, "duplicate pair emitted")
  }

  // ---- rankedRunningMin / skyline ------------------------------------

  test("rankedRunningMin equals the sequential window, both frames") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 997).map(i => (i.toLong, ((i * 7919) % 131).toLong))
      .toDF("id", "v")
    for (inclusive <- Seq(true, false)) {
      val hi = if (inclusive) Window.currentRow else -1L
      val seq = df.withColumn("m",
          min(col("v")).over(Window.orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, hi)))
        .select(col("id"), col("m")).collect()
        .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long](1))).toMap
      val dist = ops.Partitioning.rankedRunningMin(
          df, col("v"), Seq(col("id")), 8, "m", inclusive)
        .select(col("id"), col("m")).collect()
        .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long](1))).toMap
      assert(dist == seq, s"inclusive=$inclusive")
    }
  }

  test("skyline: window form equals brute-force dominance incl. ties") {
    import spark.implicits._
    // crafted frontier: a tie pair on (x, y) that must BOTH survive, a
    // same-x worse-y row that must not, and interior dominated points
    val pts = Seq(
      (1L, 10L, 50L), (2L, 10L, 50L), // tie pair — both skyline
      (3L, 10L, 60L),                 // same x, worse y — dominated
      (4L, 20L, 40L),                 // frontier
      (5L, 20L, 45L),                 // dominated by 4
      (6L, 30L, 40L),                 // same y as 4 at higher x — dominated
      (7L, 40L, 10L),                 // frontier
      (8L, 50L, 10L)                  // dominated by 7
    )
    val p = pts.toDF("k", "x", "y")
    val g = p.groupBy(col("x")).agg(min(col("y")).as("ymin"))
    val gm = ops.Partitioning.rankedRunningMin(
      g, col("ymin"), Seq(col("x")), 4, "m_strict", inclusive = false)
    val got = p.join(gm, Seq("x"))
      .filter(col("y") === col("ymin") &&
        (col("m_strict").isNull || col("y") < col("m_strict")))
      .select("k").as[Long].collect().toSet
    val brute = (for {
      (k, x, y) <- pts
      if !pts.exists { case (k2, x2, y2) =>
        k2 != k && x2 <= x && y2 <= y && (x2 < x || y2 < y) }
    } yield k).toSet
    assert(brute == Set(1L, 2L, 4L, 7L), "fixture self-check")
    assert(got == brute)
  }

  // ---- evt_cusum ------------------------------------------------------

  test("cusum closed form equals the textbook recursion") {
    val rows = SparkEntry.queries("evt_cusum")(spark, sf)
      .select("event_type", "day", "x", "cusum", "alarm").collect()
      .groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getDate(1).toString)
      val xs = ordered.map(_.getLong(2))
      val n = xs.length.toLong
      val total = xs.sum
      var s = 0L // S_t = max(0, S_{t-1} + (x·n − total)) in scaled units
      ordered.zip(xs).foreach { case (r, x) =>
        s = math.max(0L, s + (x * n - total))
        assert(math.abs(r.getDouble(3) - s.toDouble / n) < 1e-3,
          s"cusum mismatch at ${r.getDate(1)}")
        assert(r.getBoolean(4) == (s > 25L * n), "alarm threshold")
      }
    }
  }

  // ---- evt_autocorr ---------------------------------------------------

  test("autocorr: bounded, pair counts shrink with lag") {
    val rows = SparkEntry.queries("evt_autocorr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byLag = rs.map(r => r.getInt(1) -> r.getLong(2)).toMap
      // contiguous daily series: lag k has exactly n_days − k pairs, so
      // counts strictly decrease in k; with calendar gaps they still
      // cannot increase by construction of the di-offset join
      (1 to 6).foreach { k =>
        if (byLag.contains(k) && byLag.contains(k + 1))
          assert(byLag(k) >= byLag(k + 1), s"pair count grew at lag ${k + 1}")
      }
      rs.foreach { r =>
        val acf = r.getDouble(3)
        assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9, s"acf $acf out of range")
      }
    }
  }

  // ---- dependence screens --------------------------------------------

  test("chi2 per-cell report sums to the mutual-info query's global chi2") {
    val terms = SparkEntry.queries("agg_chi2")(spark, sf)
      .agg(sum(col("chi2_term"))).head().getDouble(0)
    val mi = SparkEntry.queries("agg_mutual_info")(spark, sf).head()
    assert(math.abs(terms - mi.getAs[Double]("chi2")) < 1e-3,
      "two independently-computed chi² disagree")
    assert(mi.getAs[Double]("mi_nats") >= -1e-6, "MI is a KL divergence, ≥ 0")
    val v = mi.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, s"cramers_v $v out of [0,1]")
  }

  test("chi2 cells: observed margins reproduce the expected counts") {
    val rows = SparkEntry.queries("agg_chi2")(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("observed")).sum
    // expected · n = r · k, so summing expected over a row of the
    // contingency table recovers that row's observed margin
    rows.groupBy(_.getAs[String]("status")).foreach { case (_, rs) =>
      val obsMargin = rs.map(_.getAs[Long]("observed")).sum.toDouble
      val expMargin = rs.map(_.getAs[Double]("expected")).sum
      assert(math.abs(obsMargin - expMargin) < 0.01 * obsMargin + 0.01)
    }
    assert(n > 0)
  }

  test("woe/iv: buckets partition lineitem, every defined iv_term ≥ 0") {
    val rows = SparkEntry.queries("agg_woe_iv")(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.core.Tables.t(spark, sf, "lineitem").count()
    assert(rows.map(r => r.getAs[Long]("n_event") + r.getAs[Long]("n_non")).sum == li)
    rows.foreach { r =>
      Option(r.getAs[java.lang.Double]("iv_term")).foreach(x =>
        assert(x >= 0.0, s"negative IV term $x")) // (p−q), ln share a sign
      if (r.getAs[java.lang.Double]("woe") == null)
        assert(r.getAs[Long]("n_event") == 0L || r.getAs[Long]("n_non") == 0L)
    }
  }

  // ---- etl_time_split_audit ------------------------------------------

  test("time split audit: counts partition orders, dates respect cutoff") {
    val r = SparkEntry.queries("etl_time_split_audit")(spark, sf).head()
    val o = graft.core.Tables.t(spark, sf, "orders").count()
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == o)
    assert(r.getAs[java.sql.Date]("train_end").toString < "1997-01-01")
    assert(r.getAs[java.sql.Date]("test_start").toString >= "1997-01-01")
    val overlap = r.getAs[Long]("n_cust_overlap")
    assert(overlap <= math.min(r.getAs[Long]("n_cust_train"),
      r.getAs[Long]("n_cust_test")))
    // the emitted fraction is rounded to 6dp in the query
    assert(math.abs(r.getAs[Double]("test_leak_frac") -
      overlap.toDouble / r.getAs[Long]("n_cust_test")) < 5e-7)
  }

  // ---- llm_pmi_collocations ------------------------------------------

  test("bm25: top-ranked doc replays from first-principles statistics") {
    val out = SparkEntry.queries("llm_bm25")(spark, sf).collect()
    assert(out.length == 20)
    assert(out.forall(r => r.getAs[Long]("n_terms") >= 1 &&
      r.getAs[Long]("n_terms") <= 3))
    assert(out.forall(_.getAs[Double]("bm25") > 0.0))
    // scores arrive ranked
    val scores = out.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // replay the winner's score from raw tokenization
    val top = out.head
    val docs = graft.core.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ts")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum / n
    val qs = Seq("hash", "join", "spark")
    val dfm = qs.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val ts = docs.toMap.apply(top.getAs[Long]("doc_id"))
    val want = qs.map { t =>
      val tf = ts.count(_ == t).toDouble
      if (tf == 0) 0.0
      else math.rint(math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) *
        tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * ts.length / avgdl)) * 1e6) / 1e6
    }.sum
    assert(math.abs(want - top.getAs[Double]("bm25")) < 1e-5,
      s"bm25 replay $want vs ${top.getAs[Double]("bm25")}")
  }

  test("pmi: support floor holds and the top row replays from raw counts") {
    val out = SparkEntry.queries("llm_pmi_collocations")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("c_big") >= 3L), "support floor")
    // recompute the top pair's ingredients from first principles
    val top = rows.head
    val (w1, w2) = (top.getAs[String]("w1"), top.getAs[String]("w2"))
    import spark.implicits._
    val toks = graft.core.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
    val nUni = toks.select(explode(col("ts"))).count()
    val c1 = toks.select(explode(col("ts")).as("t"))
      .filter(col("t") === w1).count()
    val c2 = toks.select(explode(col("ts")).as("t"))
      .filter(col("t") === w2).count()
    val big = toks.select(col("doc_id"),
        expr("transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS a, ts[i] AS b))").as("bs"))
      .select(explode(col("bs")).as("p"))
    val nBig = big.count()
    val cBig = big.filter(col("p.a") === w1 && col("p.b") === w2).count()
    assert(cBig == top.getAs[Long]("c_big"))
    val pmi = math.log(cBig.toDouble * nUni * nUni / (nBig.toDouble * c1 * c2))
    assert(math.abs(pmi - top.getAs[Double]("pmi")) < 1e-5)
  }
}
