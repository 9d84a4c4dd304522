package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Partitioning

/** Edge semantics of the analytics extension (queries/Analytics.scala) and
  * the distributed prefix sum it rides on (ops/Partitioning.rankedCumSum).
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("rankedCumSum equals the sequential global-window cumsum") {
    import spark.implicits._
    // ties on the value column + enough rows to span several range
    // partitions; the full order includes the id tiebreak so both
    // formulations are deterministic.
    val df = (1 to 997).map(i => (i.toLong, (i % 13).toLong)).toDF("id", "v")
    val dist = Partitioning.rankedCumSum(
        df, col("v"), Seq(col("v").desc, col("id")), 8, "cum")
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    val seq = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("v").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    assert(dist == seq)
  }

  test("rankedCumSum keeps the heavy cumsum window partitioned") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val out = Partitioning.rankedCumSum(df, col("v"), Seq(col("id")), 4, "cum")
    // every Window over the row-level data must carry a partitionBy; the
    // only partition-less window allowed is the per-partition offset scan
    // (bounded by the partition count, never data-sized).
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size == 1, "expected exactly the offset-scan window")
    // the unpartitioned one aggregates __psum (one row per partition id)
    assert(unpartitioned.head.windowExpressions.mkString.contains("__psum"),
      "the data-sized window lost its partitionBy")
  }

  test("pareto ABC: shares monotone, end at 1.0, classes consistent") {
    val out = graft.SparkEntry.queries("agg_pareto_abc")(spark, sf)
      .orderBy(col("cum_share")).collect()
    val shares = out.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-12)
    out.foreach { r =>
      val (s, c) = (r.getAs[Double]("cum_share"), r.getAs[String]("abc"))
      val expect = if (s <= 0.7) "A" else if (s <= 0.9) "B" else "C"
      assert(c == expect, s"share $s classified $c")
    }
    assert(out.map(_.getAs[String]("abc")).toSet == Set("A", "B", "C"))
  }

  test("gini: bounded to [0,1); uniform distribution scores ~0") {
    val out = graft.SparkEntry.queries("agg_gini")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $g")
    }
    // formula sanity on a crafted uniform group: G → 0 as all x equal
    // ((n+1)/n - (n+1)/n exactly, modulo the rank-mean term)
    import spark.implicits._
    val eq = Seq.tabulate(40)(i => (1L, i.toLong, 100L))
      .toDF("nationkey", "custkey", "rev_c")
    val n = 40.0
    val irev = (1 to 40).map(_ * 100L).sum.toDouble
    val gini = 2.0 * irev / (n * 4000.0) - (n + 1.0) / n
    assert(math.abs(gini) < 1e-12)
    assert(eq.count() == 40) // fixture actually built
  }

  test("table fingerprint is order-independent and content-sensitive") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("etl_table_fingerprint")(spark, sf)
      .collect().map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("fp"))).toMap
    assert(out.keySet == Set("customer", "orders"))
    // same rows, different physical order → same fingerprint: bit_xor of
    // per-row hashes is commutative, so a repartitioned scan must agree.
    def fpOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(conv(substring(md5(concat_ws("|",
          col("a").cast("string"), col("b"))), 1, 15), 16, 10)
          .cast("bigint").as("h"))
        .agg(bit_xor(col("h"))).head().getLong(0)
    val base = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("a", "b")
    assert(fpOf(base) == fpOf(base.repartition(7).sortWithinPartitions("b")))
    val changed = Seq((1L, "x"), (2L, "Y"), (3L, "z")).toDF("a", "b")
    assert(fpOf(base) != fpOf(changed))
  }

  test("url dedup: canon urls normalized, groups partition the corpus") {
    val docs = graft.core.Tables.t(spark, sf, "documents").count()
    val out = graft.SparkEntry.queries("llm_url_dedup")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_dups")).sum == docs,
      "dedup groups must partition all documents")
    out.foreach { r =>
      val u = r.getAs[String]("canon_url")
      assert(!u.contains("utm_"), s"tracking param survived: $u")
      assert(!u.contains("#"), s"fragment survived: $u")
      assert(!u.takeWhile(_ != '?').endsWith("/"), s"trailing slash: $u")
      val host = u.stripPrefix("https://").takeWhile(c => c != '/' && c != '?')
      assert(host == host.toLowerCase, s"host not lowercased: $u")
    }
  }

  test("repetition score: template spam flagged, varied text not") {
    import spark.implicits._
    // crafted corpus: one heavily templated doc, one all-distinct doc
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    Seq(
      (1L, "buy now buy now buy now buy now buy now", "en", "spam", 39L),
      (2L, "the quick brown fox jumps over a lazy dog", "en", "ok", 41L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("llm_repetition_score")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val spam = out(1L)
    assert(spam.getAs[Double]("top_word_frac") == 0.5) // 'buy'/'now' 5 of 10
    assert(spam.getAs[Double]("top_bigram_frac") == 5.0 / 9) // 'buy now' ×5
    assert(spam.getAs[Boolean]("flagged"))
    val ok = out(2L)
    assert(ok.getAs[Double]("top_word_frac") == 1.0 / 9) // all distinct
    assert(!ok.getAs[Boolean]("flagged"))
    // and on the real corpus both classes must occur (thresholds sit
    // inside the observed fraction range)
    val real = graft.SparkEntry.queries("llm_repetition_score")(spark, sf)
      .groupBy(col("flagged")).count().collect()
    assert(real.length == 2, s"degenerate flag split: ${real.mkString}")
  }

  test("ignore-nulls windows jump gaps instead of returning the gap") {
    val out = graft.SparkEntry.queries("win_ignore_nulls")(spark, sf)
    // next_v/prev_v/first_v/second_v must never be NULL-because-of-a-gap:
    // each non-null emitted value equals SOME non-null v of the same user,
    // and next_v on a row directly before a null run skips past it.
    val rows = out.collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val vs = rs.map(r => Option(r.getAs[java.lang.Double]("v"))).flatten
        .map(_.toDouble).toSet
      rs.foreach { r =>
        Seq("next_v", "prev_v", "first_v", "second_v").foreach { c =>
          Option(r.getAs[java.lang.Double](c)).foreach(x =>
            assert(vs.contains(x.toDouble), s"$c emitted a non-member value"))
        }
      }
    }
    // sanity: some rows DO have a null v (the view gap) yet a non-null next_v
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("v")) &&
      !r.isNullAt(r.fieldIndex("next_v"))))
  }

  test("skew profile: quantile ordering and skew factor bounds") {
    val r = graft.SparkEntry.queries("etl_skew_profile")(spark, sf).head()
    val (p50, p99) = (r.getAs[Double]("p50_key_rows"), r.getAs[Double]("p99_key_rows"))
    val maxK = r.getAs[Long]("max_key_rows")
    assert(p50 <= p99 && p99 <= maxK)
    assert(r.getAs[Double]("skew_factor") >= 1.0)
    assert(r.getAs[Long]("n_rows") ==
      graft.core.Tables.t(spark, sf, "events").count())
  }

  test("parameterized SQL binds named markers exactly like literals") {
    val bound = graft.SparkEntry.queries("fn_sql_params")(spark, sf)
      .collect().map(_.getAs[Long]("o_orderkey")).toSet
    graft.core.Tables.registerAll(spark, sf)
    val literal = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0 AND o_orderstatus = 'F'")
      .collect().map(_.getAs[Long]("o_orderkey")).toSet
    assert(bound == literal && bound.nonEmpty)
  }

  test("scd2 point-in-time join: one version per fact, equi-join plan") {
    val out = graft.SparkEntry.queries("join_scd2_pit")(spark, sf)
    val nOrders = graft.core.Tables.t(spark, sf, "orders").count()
    assert(out.count() == nOrders,
      "version intervals must partition each key's timeline")
    // fact orders resolve DISTINCT versions only when dates differ; at
    // minimum the self-version (pit = own date + 30d) must be reachable
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"temporal lookup degenerated to a BNLJ:\n$plan")
  }

  test("benford: digits 1-9, fractions sum to 1, expectation is Benford") {
    val rows = graft.SparkEntry.queries("agg_benford")(spark, sf).collect()
    val digits = rows.map(_.getAs[Int]("digit")).sorted
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(math.abs(rows.map(_.getAs[Double]("obs_frac")).sum - 1.0) < 1e-3)
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      val expect = math.log10(1.0 + 1.0 / d)
      assert(math.abs(r.getAs[Double]("benford_frac") - expect) < 1e-6)
      assert(r.getAs[Double]("chi2_term") >= 0.0)
    }
  }

  test("ndcg: bounded by 1, equals 1 iff the H1 ranking is gain-ideal") {
    val rows = graft.SparkEntry.queries("win_ndcg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, i, n) = (r.getAs[Double]("dcg10"), r.getAs[Double]("idcg10"),
        r.getAs[Double]("ndcg10"))
      assert(d <= i + 1e-9, s"DCG above ideal: $d > $i")
      assert(n >= 0.0 && n <= 1.0 + 1e-9, s"ndcg out of range: $n")
    }
    // discrimination on a crafted inversion: supplier A leads H1 but B
    // dominates the H2 gains → the H1 ranking is provably sub-ideal.
    // gains B=200, A=100 ⇒ DCG = 100/log2(2)+200/log2(3),
    // IDCG = 200/log2(2)+100/log2(3) ⇒ ndcg ≈ 0.8735.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-ndcg").toString
    val liSchema = StructType(Seq(
      StructField("l_suppkey", LongType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_shipdate", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val li = Seq(
      Row(1L, 500.0, 0.0, ts("1996-01-01 00:00:00")), // A: H1 winner
      Row(2L, 400.0, 0.0, ts("1996-01-01 00:00:00")),
      Row(1L, 100.0, 0.0, ts("1998-01-01 00:00:00")), // H2 gains: A=100
      Row(2L, 200.0, 0.0, ts("1998-01-01 00:00:00"))) //           B=200
    spark.createDataFrame(spark.sparkContext.parallelize(li), liSchema)
      .write.parquet(s"$dir/lineitem.parquet")
    val suSchema = StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_nationkey", IntegerType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(1L, 7), Row(2L, 7))), suSchema)
      .write.parquet(s"$dir/supplier.parquet")
    val crafted = graft.SparkEntry.queries("win_ndcg")(spark, dir).head()
    val expect = (100.0 + 200.0 / math.log(3.0) * math.log(2.0)) /
      (200.0 + 100.0 / math.log(3.0) * math.log(2.0))
    assert(math.abs(crafted.getAs[Double]("ndcg10") -
      BigDecimal(expect).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("twap: hand-computed holding-weighted average on a crafted series") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // user 1 holds v=10 for 2 s, then v=20 for 1 s → twap = 40/3 ≈ 13.3̅;
    // the final event has no successor and must be excluded.
    val dir = java.nio.file.Files.createTempDirectory("graft-twap").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val sec = 1_000_000_000L // writeEvents convention: nanos
    val rows = Seq(
      Row(1L, 0L * sec, 1L, "m", 10.0, "{}"),
      Row(2L, 2L * sec, 1L, "m", 20.0, "{}"),
      Row(3L, 3L * sec, 1L, "m", 99.0, "{}"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("evt_twap")(spark, dir).head()
    assert(out.getAs[Long]("n_intervals") == 2)
    assert(out.getAs[Long]("total_ms") == 3000L)
    assert(math.abs(out.getAs[Double]("twap") - 40.0 / 3) < 1e-9)
  }

  test("mom growth: first month NULL, later months match hand-computed lag") {
    val rows = graft.SparkEntry.queries("win_mom_growth")(spark, sf)
      .orderBy(col("month")).collect()
    assert(rows.length > 2)
    assert(rows.head.isNullAt(rows.head.fieldIndex("mom_pct")),
      "first month has no prior period")
    val (r0, r1) = (rows(0), rows(1))
    val expect = BigDecimal(
      (r1.getAs[Double]("rev") - r0.getAs[Double]("rev"))
        / r0.getAs[Double]("rev") * 100)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r1.getAs[Double]("mom_pct") - expect) < 1e-9)
  }

  test("fk audit: real FKs intact, cross-domain probe catches orphans") {
    val rows = graft.SparkEntry.queries("etl_fk_audit")(spark, sf)
      .collect().map(r => r.getAs[String]("fk") -> r).toMap
    assert(rows.size == 6)
    rows.values.foreach { r =>
      val (nc, no) = (r.getAs[Long]("n_child"), r.getAs[Long]("n_orphans"))
      assert(no >= 0 && no <= nc)
      assert(r.getAs[Boolean]("intact") == (no == 0L))
    }
    // the five genuine star-schema FKs hold on the generated fixture
    Seq("customer.nationkey->nation", "lineitem.orderkey->orders",
        "lineitem.partkey->part", "lineitem.suppkey->supplier",
        "orders.custkey->customer")
      .foreach(fk => assert(rows(fk).getAs[Boolean]("intact"), s"$fk broken"))
    // the deliberate cross-domain probe must find orphans (user ids run
    // far past the supplier key range at every sf) — proves the audit can
    // actually fail, not just rubber-stamp
    assert(!rows("events.user_id->supplier").getAs[Boolean]("intact"),
      "probe FK unexpectedly intact — the audit never exercises a failure")
    // child counts are the true table cardinalities (left join never drops)
    assert(rows("orders.custkey->customer").getAs[Long]("n_child") ==
      graft.core.Tables.t(spark, sf, "orders").count())
  }

  test("fd check: key-implied FD holds, the rest fail on the fixture") {
    val rows = graft.SparkEntry.queries("etl_fd_check")(spark, sf)
      .collect().map(r => r.getAs[String]("fd") -> r).toMap
    assert(rows.size == 6)
    rows.values.foreach { r =>
      val (ng, nv) = (r.getAs[Long]("n_groups"), r.getAs[Long]("n_violating"))
      assert(nv >= 0 && nv <= ng && ng > 0)
      assert(r.getAs[Boolean]("holds") == (nv == 0L))
    }
    // o_orderkey is a verified key of orders → the FD to custkey holds
    assert(rows("orders: orderkey->custkey").getAs[Boolean]("holds"))
    // the generator reuses line numbers within an order, so the would-be
    // key FD genuinely fails — a real finding the audit must surface
    assert(!rows("lineitem: orderkey,linenumber->partkey").getAs[Boolean]("holds"),
      "generator now emits unique line numbers — update this anchor")
  }

  test("weighted median: matches a sequential re-computation per flag") {
    // independent oracle: sort each flag's (price-cents, weight) pairs and
    // walk the prefix weights sequentially on the driver.
    val li = graft.core.Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("bigint").as("pc"),
        round(col("l_quantity")).cast("bigint").as("w"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = li.groupBy(_._1).map { case (flag, rows) =>
      val byPrice = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byPrice.map(_._2).sum
      var cum = 0L
      val med = byPrice.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      flag -> (med / 100.0, tot)
    }
    val got = graft.SparkEntry.queries("agg_weighted_median")(spark, sf)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("w_median_price"), r.getAs[Long]("total_weight")))
      .toMap
    assert(got == expect)
  }

  test("ks test: matches a sequential ECDF-walk re-computation") {
    val li = graft.core.Tables.t(spark, sf, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("bigint").as("pc"),
        (col("l_returnflag") === "R").as("r"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val s1 = li.filter(_._2).map(_._1).sorted
    val s2 = li.filterNot(_._2).map(_._1).sorted
    val (n1, n2) = (s1.length.toLong, s2.length.toLong)
    // exact integer ECDF comparison at every distinct value
    val best = (s1 ++ s2).distinct.sorted.map { x =>
      val c1 = s1.count(_ <= x).toLong
      val c2 = s2.count(_ <= x).toLong
      (math.abs(c1 * n2 - c2 * n1), x)
    }
    val mxNum = best.map(_._1).max
    val at = best.filter(_._1 == mxNum).map(_._2).min
    val r = graft.SparkEntry.queries("agg_ks_test")(spark, sf).head()
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Double]("ks_at_price") == at / 100.0)
    assert(r.getAs[Double]("ks_d") ==
      mxNum.toDouble / (n1.toDouble * n2.toDouble))
    // two samples from the same uniform generator: D must be small but
    // positive (identical ECDFs would mean the samples literally coincide)
    assert(r.getAs[Double]("ks_d") > 0.0 && r.getAs[Double]("ks_d") < 0.5)
  }

  test("psi drift: terms non-negative, counts partition the cohorts") {
    val rows = graft.SparkEntry.queries("agg_psi_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    val o = graft.core.Tables.t(spark, sf, "orders").count()
    assert(rows.map(r => r.getAs[Long]("c_base") + r.getAs[Long]("c_cur")).sum == o,
      "buckets must partition every order exactly once")
    rows.foreach { r =>
      assert(r.getAs[Double]("price_lo") == r.getAs[Long]("bucket") * 50000.0)
      val term = Option(r.getAs[java.lang.Double]("psi_term"))
      // (p−q) and ln(p/q) always share a sign → every defined term ≥ 0
      term.foreach(x => assert(x >= 0.0, s"negative PSI term $x"))
      // NULL is reserved for the empty-cohort case
      if (term.isEmpty)
        assert(r.getAs[Long]("c_base") == 0L || r.getAs[Long]("c_cur") == 0L)
    }
  }
}
