package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** r14 directive tests: the evt_type_overlap bitmask fast path beyond 12
  * types (VERDICT r13 #5 / ADVICE r13), and the adaptive weighted-median
  * coarse bucket (VERDICT r13 #6). */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** events fixture with `nTypes` event types over `nUsers` users, with
    * deterministic membership: user u performs type k iff (u·7 + k·13)
    * mod 5 < 2 — dense enough that every pair overlaps somewhere. */
  private def eventsDir(nUsers: Int, nTypes: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r14").toString
    val rows = for {
      u <- 1 to nUsers; k <- 0 until nTypes
      if (u * 7 + k * 13) % 5 < 2
      dup <- 1 to (1 + (u + k) % 2) // duplicate rows must not inflate
    } yield (u.toLong * 100 + k * dup, u.toLong, f"type_$k%02d")
    rows.map { case (eid, uid, et) =>
      (eid, new java.sql.Timestamp(1700000000000L + eid * 1000), uid, et,
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  /** brute-force expected overlap rows off the same membership rule. */
  private def expected(nUsers: Int, nTypes: Int)
      : Map[(String, String), (Long, Long, Long)] = {
    val member = (1 to nUsers).map { u =>
      u -> (0 until nTypes).filter(k => (u * 7 + k * 13) % 5 < 2).toSet
    }.toMap
    val ty = (k: Int) => f"type_$k%02d"
    (for {
      i <- 0 until nTypes; j <- (i + 1) until nTypes
      nBoth = member.values.count(s => s(i) && s(j)).toLong
      if nBoth > 0
    } yield (ty(i), ty(j)) ->
      ((nBoth, member.values.count(_(i)).toLong,
        member.values.count(_(j)).toLong))).toMap
  }

  test("evt_type_overlap: 20-type domain takes the bitmask fast path") {
    val dir = eventsDir(nUsers = 200, nTypes = 20)
    // the mask histogram sits upstream of a ckpt cut, so the final plan
    // alone can't see it — record the pre-checkpoint segment (the
    // PlanAuditSpec mechanism)
    graft.core.Ckpt.drain()
    graft.core.Ckpt.recording = true
    val (df, segs) = try {
      val q = SparkEntry.queries("evt_type_overlap")(spark, dir)
      (q, graft.core.Ckpt.drain())
    } finally graft.core.Ckpt.recording = false
    // fast-path plan assertion: the user collapse is the bit_or mask
    // aggregate (in the pre-ckpt segment), and NO join carries user_id
    // (the fallback self-joins the distinct (user, type) table on it)
    val whole = (segs.map(_._2.toString)
      :+ df.queryExecution.optimizedPlan.toString).mkString("\n")
    assert(whole.contains("bit_or"),
      "20-type domain did not take the bitmask path")
    // the fallback's data-sized self-join carries user_id in a join
    // condition; the fast path's only joins are broadcast name/total
    // lookups on bit indexes
    assert(!df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.exists(_.condition.exists(_.references.exists(_.name == "user_id"))),
      "fast path must not self-join on user_id")
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected(200, 20))
  }

  test("evt_type_overlap: >62-type domain falls back instead of aborting") {
    val dir = eventsDir(nUsers = 60, nTypes = 70)
    val df = SparkEntry.queries("evt_type_overlap")(spark, dir)
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected(60, 70))
  }

  test("agg_weighted_median adapts its coarse bucket to a huge price domain") {
    // adversarial domain (ADVICE r13): prices spanning ~10^13 cents —
    // the fixed $1000 bucket width would need ~10^8 coarse rows and
    // trip the 100k Bounded cap; the adaptive width must keep the
    // coarse table ≤16k buckets per flag and still return the EXACT
    // lower weighted median
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r14-wm")
      .toString
    val rows = (1 to 5000).map { i =>
      val flag = if (i % 2 == 0) "A" else "B"
      // scatter prices over [1, 10^11] dollars with deterministic noise
      val price = (i.toLong * 20000000L + (i * i) % 997).toDouble
      (flag, price, (1 + i % 7).toDouble)
    }
    rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("agg_weighted_median")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    // brute reference: exact lower weighted median per flag
    val expect = rows.groupBy(_._1).map { case (f, rs) =>
      val srt = rs.map(r => (math.round(r._2 * 100), math.round(r._3)))
        .sortBy(_._1)
      val tot = srt.map(_._2).sum
      var cw = 0L
      val m = srt.find { case (_, w) => cw += w; cw * 2 >= tot }.get._1
      f -> ((m / 100.0, tot))
    }
    assert(got == expect, s"got $got vs $expect")
  }

  test("FixedLog: Spark chain is accurate and bit-identical to DuckDB") {
    // expected values computed by executing the DUCKDB-dialect chain in
    // DuckDB itself (tools-side, r14) — pinning them here proves the two
    // dialect spellings produce the same bits, which is the whole point
    // of the shared kernel (the DSIR λ table rides on it)
    val pinned = Seq(
      1L -> 0L, 2L -> 693147181L, 3L -> 1098612280L, 17L -> 2833213336L,
      255L -> 5541263542L, 256L -> 5545177448L, 257L -> 5549076087L,
      999983L -> 13815493561L, 1000000L -> 13815510552L,
      1000000000000L -> 27631021114L,
      (1L << 40) + 12345L -> 27725887240L,
      (1L << 62) - 1L -> 42975125211L)
    import spark.implicits._
    import graft.core.FixedLog
    val d = FixedLog.spark
    var cur = pinned.map(_._1).toDF("n")
      .selectExpr(s"CAST(${FixedLog.eExpr("n")} AS BIGINT) AS e", "n")
      .selectExpr("n", "e", s"${FixedLog.mInitExpr(d, "n")} AS m",
        "CAST(0 AS BIGINT) AS fr")
    for (_ <- 1 to FixedLog.FracBits)
      cur = cur.selectExpr("n", "e", s"${FixedLog.mStepExpr(d)} AS m",
        s"${FixedLog.frStepExpr(d)} AS fr")
    val got = cur.selectExpr("n", s"${FixedLog.lnPpbExpr(d)} AS lnppb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pinned.foreach { case (n, expect) =>
      assert(got(n) == expect, s"n=$n: ${got(n)} != duckdb $expect")
      // and the shared approximation tracks the true ln within budget
      assert(math.abs(got(n) - math.log(n.toDouble) * 1e9) <= 25,
        s"n=$n drifts ${got(n) - math.log(n.toDouble) * 1e9} ppb from ln")
    }
  }

  test("win_rank two-phase prune equals the naive skewed window") {
    // adversarial fixture for the r14 two-phase rewrite: group sizes
    // below / at / far above the rn<=100 cut, heavy priority ties (the
    // top-100 of status C spans several priorities, so rk/drk exceed 1
    // and jump by tie-group size), and FOUR parquet files so the
    // physical scan has multiple partitions and the local
    // (pid, status)-window prune actually prunes
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r14-wr")
      .toString
    val rows = // (orderkey, status, priority)
      (1 to 40).map(i => (i.toLong, "A", f"${1 + i % 2}%d-P")) ++
      (1 to 100).map(i => (1000L + i, "B", f"${1 + i % 3}%d-P")) ++
      (1 to 500).map(i => (10000L + i, "C", f"${1 + i % 5}%d-P"))
    rows.toDF("o_orderkey", "o_orderstatus", "o_orderpriority")
      .repartition(4).write.parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("win_rank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    val expect = rows.groupBy(_._2).flatMap { case (st, rs) =>
      val srt = rs.sortBy(r => (r._3, r._1))
      val pri = srt.map(_._3)
      srt.zipWithIndex.take(100).map { case ((ok, _, p), idx) =>
        (ok, st, p, idx + 1, pri.count(_ < p) + 1,
          pri.distinct.sorted.indexOf(p) + 1)
      }
    }.toSet
    assert(got == expect)
  }

  test("fn_luhn digit-unrolled form matches a reference Luhn on edge keys") {
    // the r14 rewrite replaced the per-character HOF fold with 19
    // unrolled digit terms; pin it against an independent string-walk
    // reference on boundary keys (single digit, carries at every
    // position, the classic 79927398713 valid number, 18- and 19-digit
    // keys near Long.MaxValue)
    import spark.implicits._
    val keys = Seq(1L, 9L, 10L, 18L, 79927398713L, 999999999999999999L,
      1000000000000000000L, Long.MaxValue, 4539578763621486L)
    def refLuhn(k: Long): Long = {
      val ds = k.toString.reverse.map(_ - '0')
      ds.zipWithIndex.map { case (dd, i) =>
        if (i % 2 == 0) dd
        else if (dd * 2 > 9) dd * 2 - 9 else dd * 2
      }.sum % 10L
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-r14-luhn")
      .toString
    keys.toDF("o_orderkey").coalesce(1)
      .write.parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("fn_luhn")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = keys.groupBy(refLuhn).map { case (rem, ks) =>
      rem -> ks.size.toLong
    }
    assert(got == expect, s"got $got vs $expect")
  }

  test("evt_type_overlap: fast and fallback paths agree on 62-boundary") {
    // 62 types = widest mask domain; must still be the fast path and
    // must equal the brute expectation (bit 61 exercised)
    val dir = eventsDir(nUsers = 80, nTypes = 62)
    graft.core.Ckpt.drain()
    graft.core.Ckpt.recording = true
    val (df, segs) = try {
      val q = SparkEntry.queries("evt_type_overlap")(spark, dir)
      (q, graft.core.Ckpt.drain())
    } finally graft.core.Ckpt.recording = false
    assert((segs.map(_._2.toString)
      :+ df.queryExecution.optimizedPlan.toString).mkString
      .contains("bit_or"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected(80, 62))
  }

  test("llm_bm25: single tokenize pass, rows identical to the 4-pass form") {
    import graft.core.Tables.{spread, t}
    val sf = TestSession.sf
    val df = SparkEntry.queries("llm_bm25")(spark, sf)
    // the r14 plan tokenizes ONCE: exactly one Generate (explode) node —
    // the old shape re-derived the exploded stream for dl, stats and df
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.size == 1, s"expected 1 Generate, got ${gens.size}")
    // old 4-pass reference form, inline (the r13 shape)
    val qTerms = Seq("hash", "join", "spark")
    val toks = spread(t(spark, sf, "documents"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("tok").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(sum(col("dl")).as("tot_len"),
      count(lit(1)).as("n_docs"))
    val termScore =
      log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        col("tf") * 2.2 /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") /
          (col("tot_len").cast("double") / col("n_docs"))))
    val ref = tf.join(dfT, Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(termScore * 1e6).cast("bigint").as("su"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        (sum(col("su")) / 1e6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
    assert(df.collect().toSeq == ref.collect().toSeq)
  }

  test("ml_apriori_rules: one corpus shuffle, rows identical to 2-shuffle form") {
    import graft.core.Tables.t
    val sf = TestSession.sf
    graft.core.Ckpt.drain()
    graft.core.Ckpt.recording = true
    val (df, segs) = try {
      val q = SparkEntry.queries("ml_apriori_rules")(spark, sf)
      (q, graft.core.Ckpt.drain())
    } finally graft.core.Ckpt.recording = false
    // the pre-ckpt basket segment pays exactly ONE corpus-wide shuffle —
    // the ok-keyed bit_or mask aggregate (the part join is broadcast; the
    // second exchange in the segment keys the mask HISTOGRAM, which is
    // post-aggregate data, one row per order). The old shape paid a
    // distinct() exchange on (ok, item) plus a second ok-keyed shuffle.
    // An executed AQE plan prints Final + Initial copies of the same
    // tree, so count only the final-plan section.
    val basketSeg = segs.map(_._2.toString.split("== Initial Plan ==")(0))
      .mkString("\n")
    assert(basketSeg.contains("bit_or"),
      "TPC-H's 25-brand domain did not take the bitmask basket path")
    val okWide = "Exchange hashpartitioning\\(ok".r
      .findAllIn(basketSeg).size
    assert(okWide == 1,
      s"expected 1 corpus-keyed (ok) exchange pre-ckpt, got $okWide")
    // old 2-shuffle + join-back reference form, inline (the r13 shape)
    val items = t(spark, sf, "lineitem")
      .join(broadcast(t(spark, sf, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
      .distinct()
    val nb = items.select(count_distinct(col("ok")).as("nn"))
    val freq = items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nb))
      .filter(col("cnt") * 10 >= col("nn"))
      .select(col("item"), col("cnt"), col("nn"))
    val fi = items.join(broadcast(freq.select(col("item"))), Seq("item"))
    val pairs = fi.groupBy(col("ok"))
      .agg(sort_array(collect_set(col("item"))).as("its"))
      .filter(size(col("its")) >= 2)
      .select(col("its"), posexplode(col("its")).as(Seq("i", "i1")))
      .select(col("i1"), explode(expr(
        "slice(its, i + 2, size(its) - i - 1)")).as("i2"))
      .groupBy(col("i1"), col("i2"))
      .agg(count(lit(1)).as("n_both"))
    val both = pairs.select(col("i1").as("ante"), col("i2").as("cons"),
        col("n_both"))
      .union(pairs.select(col("i2"), col("i1"), col("n_both")))
    val ref = both
      .join(broadcast(freq.select(col("item").as("ante"),
        col("cnt").as("n_a"))), Seq("ante"))
      .join(broadcast(freq.select(col("item").as("cons"),
        col("cnt").as("n_c"), col("nn"))), Seq("cons"))
      .filter(col("n_both") * 50 >= col("nn"))
      .filter(col("n_both") * 25 >= col("n_a") * 3)
      .select(col("ante"), col("cons"), col("n_both"),
        round(col("n_both").cast("double") / col("nn").cast("double"), 6)
          .as("support"),
        round(col("n_both").cast("double") / col("n_a").cast("double"), 6)
          .as("conf"),
        round(col("n_both").cast("double") * col("nn").cast("double") /
          (col("n_a").cast("double") * col("n_c").cast("double")), 6)
          .as("lift"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getString(1))
    assert(df.collect().map(r => key(r) -> r.toSeq).toMap ==
      ref.collect().map(r => key(r) -> r.toSeq).toMap)
  }

  test("ml_apriori_rules: >62-item domain falls back and agrees with the mask path's math") {
    import spark.implicits._
    // 70 brands — wider than a long mask; deterministic baskets: order o
    // contains brand k iff (o*3 + k*7) mod 11 < 4 (about 25 brands each,
    // enough pair overlap to produce rules at the 10%/2%/12% thresholds)
    val dir = java.nio.file.Files.createTempDirectory("graft-r14-apr")
      .toString
    val nOrders = 120; val nBrands = 70
    (1 to nBrands).map(k => (k.toLong, f"Brand#$k%03d"))
      .toDF("p_partkey", "p_brand").coalesce(1)
      .write.parquet(s"$dir/part.parquet")
    (for { o <- 1 to nOrders; k <- 1 to nBrands
           if (o * 3 + k * 7) % 11 < 4 }
      yield (o.toLong, k.toLong))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("ml_apriori_rules")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    // brute expectation straight off the membership rule
    val member = (1 to nOrders).map { o =>
      (1 to nBrands).filter(k => (o * 3 + k * 7) % 11 < 4).toSet
    }
    val nn = nOrders.toLong
    val cnt = (1 to nBrands)
      .map(k => k -> member.count(_(k)).toLong).toMap
    val frequent = (1 to nBrands).filter(k => cnt(k) * 10 >= nn)
    val bn = (k: Int) => f"Brand#$k%03d"
    val expect = (for {
      a <- frequent; c <- frequent; if a != c
      nBoth = member.count(s => s(a) && s(c)).toLong
      if nBoth * 50 >= nn && nBoth * 25 >= cnt(a) * 3
    } yield (bn(a), bn(c)) -> Seq[Any](bn(a), bn(c), nBoth,
      BigDecimal(nBoth.toDouble / nn)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(nBoth.toDouble / cnt(a))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(nBoth.toDouble * nn / (cnt(a).toDouble * cnt(c)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    assert(got.keySet == expect.keySet,
      s"rule set mismatch: got ${got.size}, expect ${expect.size}")
    got.foreach { case (k, v) =>
      assert(v.take(3) == expect(k).take(3), s"counts differ at $k")
    }
  }

  test("basket family: bounded baskets equal collect_set; saturation fails loud") {
    import graft.core.Tables.t
    val sf = TestSession.sf
    // equality vs the stock form on real data, both family members
    def refBaskets = t(spark, sf, "lineitem")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val refCos = {
      val baskets = refBaskets
      val perPart = baskets.select(explode(col("parts")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("f"))
      val pairs = baskets.filter(size(col("parts")) >= 2)
        .select(col("parts"), posexplode(col("parts")).as(Seq("i", "p1")))
        .select(col("p1"), explode(expr(
          "slice(parts, i + 2, size(parts) - i - 1)")).as("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n_both"))
      val sym = pairs.union(
        pairs.select(col("p2"), col("p1"), col("n_both")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p1")).orderBy(col("cos_ppm").desc, col("p2"))
      sym
        .join(perPart.select(col("pk").as("p1"), col("f").as("n_p1")),
          Seq("p1"))
        .join(perPart.select(col("pk").as("p2"), col("f").as("n_p2")),
          Seq("p2"))
        .filter(col("n_both") >= 2)
        .selectExpr("p1", "p2", "n_both",
          "CAST(floor(1e6 * n_both / sqrt(CAST(n_p1 AS DOUBLE) * " +
            "CAST(n_p2 AS DOUBLE)) + 0.5) AS BIGINT) AS cos_ppm")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
    }
    val gotCos = SparkEntry.queries("rec_item_cosine")(spark, sf)
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    assert(gotCos.collect().map(r => key(r) -> r.toSeq).toMap ==
      refCos.collect().map(r => key(r) -> r.toSeq).toMap)
    // fail-loud: a 65-part order must abort the probe, never emit
    // truncated baskets
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r14-sat")
      .toString
    (1 to 65).map(k => (1L, k.toLong))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("rec_item_cosine")(spark, dir)
    }
    assert(e.getMessage.contains("saturates"), e.getMessage)
  }
}
