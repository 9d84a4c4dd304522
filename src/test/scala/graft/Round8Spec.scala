package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contracts for the r8 scale/parity fixes: the grid-based exact ntile
  * in llm_ccnet_buckets, the driver-side union-find in graph_components,
  * the ppm confusion ratios, and the data-derived EntityRes rid offset. */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("llm_ccnet_buckets grid arithmetic equals the window ntile") {
    // the engine computes ntile(3) via cell-grid integer arithmetic —
    // this is the bit-parity check against Spark's own window ntile on
    // the identical (lm6 desc, doc_id) ordering
    val got = SparkEntry.queries("llm_ccnet_buckets")(spark, sf)
      .select(col("doc_id"), col("lang"), col("lm6"), col("ppl_bucket"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
      .toSet
    val scored = SparkEntry.queries("llm_ccnet_buckets")(spark, sf)
      .select(col("doc_id"), col("lang"), col("lm6"))
    val nt = ntile(3).over(Window.partitionBy(col("lang"))
      .orderBy(col("lm6").desc, col("doc_id")))
    val want = scored.withColumn("nt", nt)
      .select(col("doc_id"), col("lang"),
        when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
          .otherwise("tail").as("b"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == want)
    // terciles are equal-size within ±1 per language
    val sizes = got.groupBy(t => (t._2, t._3)).map { case (k, v) =>
      k -> v.size
    }
    sizes.keys.map(_._1).foreach { lang =>
      val s = sizes.collect { case ((l, _), n) if l == lang => n }
      assert(s.max - s.min <= 1, s"$lang tercile sizes $s")
    }
  }

  test("graph_components union-find matches min-label propagation") {
    val rows = SparkEntry.queries("graph_components")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 25) // every nation labeled
    // labels are component minima: each label must itself map to itself
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val byKey = rows.map { case (name, comp) =>
      nation.collectFirst { case (k, n) if n == name => k }.get -> comp
    }.toMap
    byKey.foreach { case (node, comp) =>
      assert(comp <= node, s"label $comp above member $node")
      assert(byKey(comp) == comp, s"label $comp is not its own label")
    }
  }

  test("er rid offset derives from the data and bands stay disjoint") {
    val off = graft.queries.EntityRes.ridOffset(spark, sf)
    val maxKey = spark.read.parquet(s"$sf/part.parquet")
      .agg(max(col("p_partkey")).cast("long")).collect()(0).getLong(0)
    assert(off == maxKey + 1)
    val recs = graft.queries.EntityRes.records(spark, sf).collect()
      .map(r => r.getLong(0))
    val (clean, variants) = recs.partition(_ < off)
    assert(clean.nonEmpty && variants.nonEmpty)
    assert(variants.length == 2 * clean.length)
    // the two variant bands never collide with each other or with clean
    val band1 = variants.filter(_ < 2 * off)
    val band2 = variants.filter(_ >= 2 * off)
    assert(band1.length == clean.length && band2.length == clean.length)
    assert(recs.distinct.length == recs.length)
  }

  test("evt_frequent_seq2 matches a brute-force local support count") {
    val rows = SparkEntry.queries("evt_frequent_seq2")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ev = graft.core.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val byUser = ev.groupBy(_._1)
    val types = ev.map(_._2).distinct
    val want = (for {
      a <- types; b <- types if a != b
    } yield (a, b) -> byUser.values.count { es =>
      val as = es.filter(_._2 == a).map(_._3)
      val bs = es.filter(_._2 == b).map(_._3)
      as.nonEmpty && bs.nonEmpty && as.min < bs.max
    }.toLong).filter(_._2 > 0).toMap
    assert(rows == want)
  }

  test("graph_harmonic_centrality invariants: bounds and label sanity") {
    val rows = SparkEntry.queries("graph_harmonic_centrality")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 25)
    rows.foreach { case (name, reach, h) =>
      assert(reach >= 0 && reach <= 24, s"$name reach $reach")
      // 1/d <= 1 per reachable node, and >= 1/6 under the 6-hop cap
      assert(h <= reach.toDouble + 1e-9, s"$name h=$h reach=$reach")
      assert(h >= reach.toDouble / 6.0 - 1e-9, s"$name h=$h reach=$reach")
      assert((h == 0.0) == (reach == 0), name)
    }
  }

  test("llm_hard_negatives: different label, ranked, below global top-1") {
    val negs = SparkEntry.queries("llm_hard_negatives")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getInt(5)))
    assert(negs.nonEmpty)
    negs.foreach { case (qid, qlabel, cid, clabel, _, rn) =>
      assert(clabel != qlabel, s"q$qid got same-label negative $cid")
      assert(rn >= 1 && rn <= 3)
      assert(cid != qid)
    }
    // per query: sims non-increasing in rank
    negs.groupBy(_._1).foreach { case (qid, g) =>
      val byRank = g.sortBy(_._6).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"q$qid")
    }
    // a hard negative can never beat the unconstrained top-1 neighbor
    val top1 = SparkEntry.queries("llm_cosine_topk")(spark, sf).collect()
      .filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    negs.filter(_._6 == 1).foreach { case (qid, _, _, _, sim, _) =>
      top1.get(qid).foreach(t => assert(sim <= t + 1e-12, s"q$qid"))
    }
  }

  test("tpch_q18_big_orders: thresholds hold and totals reconcile") {
    val rows = SparkEntry.queries("tpch_q18_big_orders")(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val ok = r.getLong(2); val tq = r.getDouble(5)
      assert(tq > 300.0)
      assert(math.abs(li(ok) - tq) < 1e-9)
    }
    assert(rows.length <= 20)
  }

  test("evt_theil_sen matches a local pairwise-median replay") {
    val got = SparkEntry.queries("evt_theil_sen")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val daily = graft.core.Tables.t(spark, sf, "events")
      .groupBy(col("event_type"),
        org.apache.spark.sql.functions.date_trunc("day", col("ts")).as("dy"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, ds) =>
      val pts = ds.map(t => (t._2 / 86400000L, t._3)).sortBy(_._1)
      val sl = for {
        i <- pts.indices; j <- pts.indices if i < j
      } yield math.floor(
        (pts(j)._2 - pts(i)._2).toDouble * 1e6 /
          (pts(j)._1 - pts(i)._1).toDouble + 0.5)
      if (sl.nonEmpty) {
        val s = sl.sorted
        val med = if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
        val (np, slope) = got(tpe)
        assert(np == sl.length, tpe)
        assert(math.abs(slope - med / 1e6) < 1e-12, s"$tpe $slope vs $med")
      }
    }
  }

  test("ml_pr_curve: suffix sums are monotone and anchor to the totals") {
    val rows = SparkEntry.queries("ml_pr_curve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, tp, pp, prec, rec) =>
      assert(tp <= pp)
      assert(prec >= 0 && prec <= 1000000)
      assert(rec >= 0 && rec <= 1000000)
    }
    // tp and pp are suffix sums: non-increasing as the threshold rises
    rows.sliding(2).foreach {
      case Array((_, tp1, pp1, _, r1), (_, tp2, pp2, _, r2)) =>
        assert(tp1 >= tp2 && pp1 >= pp2)
        assert(r1 >= r2) // recall falls with the threshold
      case _ =>
    }
    // the lowest threshold predicts everything positive: recall = 1
    assert(rows.head._5 == 1000000)
  }

  test("llm_bpe_fertility reconciles with the per-doc encode output") {
    val fert = SparkEntry.queries("llm_bpe_fertility")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val enc = SparkEntry.queries("llm_bpe_encode")(spark, sf)
      .join(graft.core.Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("lang")), Seq("doc_id"))
      .collect()
      .map(r => (r.getString(4), r.getLong(1), r.getLong(2)))
    val byLang = enc.groupBy(_._1).map { case (l, g) =>
      l -> (g.map(_._2).sum, g.map(_._3).sum)
    }
    assert(fert.keySet == byLang.keySet)
    fert.foreach { case (lang, (words, tokens, f)) =>
      assert((words, tokens) == byLang(lang), lang)
      assert(f >= 1.0, s"$lang fertility $f below 1 token/word")
      assert(f == math.floor(1e6 * tokens / words + 0.5) / 1e6, lang)
    }
  }

  test("ml_decision_stump matches a brute-force Gini search") {
    val r = SparkEntry.queries("ml_decision_stump")(spark, sf).collect()(0)
    val (thr, nl, nr, gini) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(org.apache.spark.sql.functions.round(col("l_quantity"))
        .cast("long").as("q"), col("l_returnflag")).collect()
      .map(x => (x.getLong(0), x.getString(1) == "R"))
    val n = rows.length.toLong
    val p = rows.count(_._2).toLong
    def wg(t: Long): (Long, Long, Long) = {
      val left = rows.filter(_._1 <= t)
      val (nlb, plb) = (left.length.toLong, left.count(_._2).toLong)
      def g(pp: Long, nn: Long) =
        1.0 - (pp.toDouble / nn) * (pp.toDouble / nn) -
          ((nn - pp).toDouble / nn) * ((nn - pp).toDouble / nn)
      val w = (nlb * g(plb, nlb) + (n - nlb) * g(p - plb, n - nlb)) / n
      (nlb, math.floor(1e6 * w + 0.5).toLong, plb)
    }
    val best = rows.map(_._1).distinct.sorted.filter(t => wg(t)._1 < n)
      .map(t => (wg(t)._2, t)).min
    assert(thr == best._2, s"threshold $thr vs ${best._2}")
    assert(gini == best._1)
    val (nlb, _, _) = wg(thr)
    assert(nl == nlb && nr == n - nlb)
  }

  test("agg_welch_t matches a local Welch computation") {
    val r = SparkEntry.queries("agg_welch_t")(spark, sf).collect()(0)
    val (tStat, df) = (r.getDouble(0), r.getDouble(1))
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag"),
        org.apache.spark.sql.functions.round(col("l_extendedprice") * 100)
          .cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    def stats(g: String) = {
      val v = rows.filter(_._1 == g).map(_._2)
      val nn = v.length.toDouble
      val m = v.map(BigInt(_)).sum.toDouble / nn
      val q = v.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      val va = (q - nn * m * m) / (nn - 1)
      (nn, m, va / nn)
    }
    val (n1, m1, se1) = stats("A"); val (n2, m2, se2) = stats("R")
    val tB = (m1 - m2) / math.sqrt(se1 + se2)
    val dfB = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    assert(math.abs(tStat - tB) < 1e-4, s"$tStat vs $tB")
    assert(math.abs(df - dfB) / dfB < 1e-4, s"$df vs $dfB")
  }

  test("fn_geohash: local morton + base32 replay, lon leads the bits") {
    val b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    val rows = SparkEntry.queries("fn_geohash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lonq, latq, morton, gh) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      assert(lonq >= 0 && lonq < 32768 && latq >= 0 && latq < 32768)
      assert(morton ==
        graft.functions.ZOrderBits.interleave16(latq.toInt, lonq.toInt))
      val expect = (0 to 5)
        .map(i => b32.charAt(((morton >> (25 - 5 * i)) & 31).toInt))
        .mkString
      assert(gh == expect)
      // MSB of the 30-bit code is the longitude's top bit (geohash order)
      assert(((morton >> 29) & 1) == ((lonq >> 14) & 1))
    }
  }

  test("hilbert kernel: known table, bijection, unit-step continuity") {
    import graft.functions.HilbertBits.xy2d
    // order-1 canonical U: (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3
    assert(xy2d(1, 0, 0) == 0L && xy2d(1, 0, 1) == 1L)
    assert(xy2d(1, 1, 1) == 2L && xy2d(1, 1, 0) == 3L)
    // order-5: a bijection onto [0, 1024) whose consecutive indices are
    // ALWAYS grid neighbors — the locality property Z-order lacks
    val n = 32
    val all = for (x <- 0 until n; y <- 0 until n) yield (xy2d(5, x, y), x, y)
    assert(all.map(_._1).sorted == (0L until (n.toLong * n)).toSeq)
    all.sortBy(_._1).sliding(2).foreach {
      case Seq((_, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"curve jumps between ($x1,$y1) and ($x2,$y2)")
      case _ =>
    }
  }

  test("fn_hilbert matches the local kernel on the real points") {
    val rows = SparkEntry.queries("fn_hilbert")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xi, yi, h) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(h == graft.functions.HilbertBits.xy2d(14, xi.toInt, yi.toInt))
      assert(h >= 0 && h < (1L << 28))
    }
  }

  test("evt_growth_accounting: identities hold against the activity set") {
    val rows = SparkEntry.queries("evt_growth_accounting")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val mu = graft.core.Tables.t(spark, sf, "events")
      .select(col("user_id"),
        (unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("di"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = mu.groupBy(_._2).map { case (d, v) => d -> v.length.toLong }
    // new + retained + resurrected = DAU for every day
    rows.foreach { case (d, (nw, rt, rs, _)) =>
      assert(nw + rt + rs == byDay(d), s"day $d DAU mismatch")
    }
    // total new = distinct users; churn conservation: every churn is
    // preceded by a new or a resurrection (a user churns once per stint)
    assert(rows.values.map(_._1).sum == mu.map(_._1).distinct.length)
    assert(rows.values.map(_._4).sum <=
      rows.values.map(t => t._1 + t._3).sum)
    // retained(d) ≤ DAU(d-1)
    rows.foreach { case (d, (_, rt, _, _)) =>
      byDay.get(d - 1).foreach(prev => assert(rt <= prev, s"day $d"))
    }
  }

  test("llm_source_overlap is a symmetric-upper matrix bounded by corpora") {
    val rows = SparkEntry.queries("llm_source_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n) =>
      assert(a < b, s"not canonical: $a !< $b")
      assert(n > 0)
    }
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    // shared shingles with any partner cannot exceed a source's own
    // distinct shingle count
    val own = graft.llm.TextOps.shingles(spark, sf)
      .join(graft.core.Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("shingle"), col("source")).distinct()
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (a, b, n) =>
      assert(n <= math.min(own(a), own(b)), s"$a-$b overlap $n too large")
    }
  }

  test("agg_hdr_quantiles brackets the exact order statistics") {
    val rows = SparkEntry.queries("agg_hdr_quantiles")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val vals = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"),
        org.apache.spark.sql.functions.round(col("l_extendedprice") * 100)
          .cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).sorted }
    rows.foreach { case (g, (n, p50, p90, p99)) =>
      val v = vals(g)
      assert(n == v.length)
      Seq((50, p50), (90, p90), (99, p99)).foreach { case (p, est) =>
        val exact = v(((n * p + 99) / 100 - 1).toInt) // ceil(n·p/100)-th
        // the sketch returns the 2-significant-digit bin's lower bound:
        // est ≤ exact < est · (f2+1)/f2 ≤ 1.1 · est
        assert(est <= exact, s"$g p$p est $est above exact $exact")
        assert(exact < est * 11 / 10 + 10, s"$g p$p est $est too far below $exact")
      }
    }
  }

  test("ml_ks_model replays from the trained weights") {
    val r = SparkEntry.queries("ml_ks_model")(spark, sf).collect()(0)
    val (ksBin, ksPpm) = (r.getLong(0), r.getLong(1))
    assert(ksPpm >= 0 && ksPpm <= 1000000)
    val wRow = SparkEntry.queries("ml_logreg_gd")(spark, sf).collect()(0)
    val (w0, w1, w2) = (wRow.getDouble(0), wRow.getDouble(1),
      wRow.getDouble(2))
    val pts = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(org.apache.spark.sql.functions.round(col("l_quantity"))
          .cast("double").as("q"),
        org.apache.spark.sql.functions.round(col("l_discount") * 100)
          .cast("double").as("dc"), col("l_returnflag"))
      .collect()
      .map(x => (x.getDouble(0) / 50.0, x.getDouble(1) / 10.0,
        x.getString(2) == "R"))
    // weights are round(w,6) in the driver output — recompute bins with
    // them; the 0.005-wide bins absorb the 1e-6 weight rounding except
    // exactly at a bin edge, so compare KS with a 1-bin tolerance
    val binned = pts.map { case (x1, x2, pos) =>
      val z = w0 + w1 * x1 + w2 * x2
      val sg = 0.5 * (1.0 + z / (1.0 + math.abs(z)))
      (math.min(math.floor(sg * 200).toLong, 199L), pos)
    }
    val p = binned.count(_._2).toLong; val n = binned.length - p
    val byBin = binned.groupBy(_._1).toSeq.sortBy(_._1)
    var cp = 0L; var cn = 0L; var best = 0L
    byBin.foreach { case (_, g) =>
      cp += g.count(_._2); cn += g.count(!_._2)
      val gap = math.abs(math.floor(1e6 * cp / p + 0.5) -
        math.floor(1e6 * cn / n + 0.5)).toLong
      if (gap > best) best = gap
    }
    assert(math.abs(ksPpm - best) <= 1000, s"ks $ksPpm vs local $best")
    assert(ksBin >= 0 && ksBin <= 199)
  }

  test("evt_markov_steady conserves mass and matches FP power iteration") {
    val rows = SparkEntry.queries("evt_markov_steady")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val mass = rows.map(_._2).sum
    assert(math.abs(mass - 1000000000000L) < 1e8,
      s"mass drifted: $mass")
    rows.foreach { case (_, v, pp) =>
      assert(v >= 0)
      assert(math.abs(pp - v.toDouble / 1e12) < 1e-15)
    }
    // double-precision power iteration from the same transition matrix
    val tr = SparkEntry.queries("evt_markov_transitions")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getDouble(3))).toMap
    val states = rows.map(_._1)
    var v: Seq[Double] = states.toSeq.map(_ => 1.0 / states.length)
    for (_ <- 1 to 10) {
      v = states.toSeq.map(j => states.toSeq.zip(v).map { case (i, vi) =>
        vi * tr.getOrElse((i, j), 0.0)
      }.sum)
    }
    states.zip(v).zip(rows.map(_._3)).foreach { case ((st, fp), got) =>
      assert(math.abs(fp - got) < 1e-4, s"$st: $got vs fp $fp")
    }
  }

  test("ml_confusion ppm ratios are floor(1e6 x + 0.5) integers") {
    val rows = SparkEntry.queries("ml_confusion")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      Seq(4, 5, 6).foreach { i =>
        val v = r.getLong(i)
        assert(v >= 0 && v <= 1000000, s"ppm col $i out of range: $v")
      }
    }
  }
}
