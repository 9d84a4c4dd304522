package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Contracts for the r7 graph-metric + projection additions
  * (graph_clustering_coeff, graph_assortativity, llm_random_projection)
  * against local brute-force recomputation on sf0.001. */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("graph_clustering_coeff is consistent: 0 <= c <= 1, exact formula") {
    val rows = SparkEntry.queries("graph_clustering_coeff")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val deg = r.getLong(1); val tri = r.getLong(2); val c = r.getDouble(3)
      assert(deg >= 1)
      assert(tri >= 0)
      if (deg >= 2) {
        val expect = math.rint(2.0 * tri / (deg * (deg - 1)) * 1e6) / 1e6
        assert(math.abs(c - expect) <= 1e-6, s"${r.getString(0)}: $c vs $expect")
        // a node cannot close more triangles than its wedge count
        assert(2 * tri <= deg * (deg - 1))
      } else assert(c == 0.0)
    }
  }

  test("graph_assortativity is a correlation: in [-1, 1]") {
    val r = SparkEntry.queries("graph_assortativity")(spark, sf)
      .collect()(0).getDouble(0)
    assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9, s"assortativity $r")
  }

  test("agg_raking_ipf: final sweep pins region margins to uniform") {
    val rows = SparkEntry.queries("agg_raking_ipf")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val total = rows.map(_._4).sum
    val regions = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum)
    regions.foreach { case (reg, m) =>
      assert(math.abs(m - total / regions.size) < 1e-4 * total,
        s"region $reg margin $m vs ${total / regions.size}")
    }
    // segment margins converge toward uniform (within 2% after 2 sweeps)
    val segs = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    segs.foreach { case (seg, m) =>
      assert(math.abs(m - total / segs.size) < 0.02 * total, s"segment $seg")
    }
    // raking preserves the grand total
    assert(math.abs(total - rows.map(_._3).sum.toDouble) < 1e-6 * total)
  }

  test("ml_quantile_normalize is monotone and lands on pooled values") {
    val rows = SparkEntry.queries("ml_quantile_normalize")(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val pooled = rows.map(_._2).toSet // qnorm targets come from the pool
    rows.foreach { case (_, _, q) => assert(pooled.contains(q)) }
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val m = rs.map(t => t._2 -> t._3).distinct.sortBy(_._1)
      m.sliding(2).filter(_.length == 2).foreach { pair =>
        val (v1, q1) = pair(0); val (v2, q2) = pair(1)
        assert(q1 <= q2, s"$src: qnorm not monotone at $v1->$v2 ($q1, $q2)")
      }
      // the per-source maximum maps to the pooled maximum
      assert(m.last._2 == rows.map(_._2).max, s"$src max mapping")
    }
  }

  test("agg_poisson_bootstrap replicates center on the true total") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val n = li.count()
    val totalCents = li.selectExpr(
      "sum(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS s")
      .collect()(0).getLong(0)
    val reps = SparkEntry.queries("agg_poisson_bootstrap")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(reps.length == 16)
    reps.foreach { case (r, nEff, cents) =>
      // Poisson(1) row weights: n_eff ~ N ± ~6·sqrt(N)
      assert(math.abs(nEff - n) < 6 * math.sqrt(n.toDouble) + 10,
        s"replicate $r n_eff $nEff vs $n")
      assert(math.abs(cents - totalCents).toDouble <
        0.05 * totalCents + 1e7, s"replicate $r sum")
    }
    // determinism: replicate sums must differ from each other (hash draw
    // is per (replicate, row))
    assert(reps.map(_._3).distinct.length > 8)
  }

  test("evt_decompose recomposes: trend + seasonal + resid = n") {
    val rows = SparkEntry.queries("evt_decompose")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(2)
      val sum = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      assert(math.abs(sum - n) < 1e-4, s"recompose $sum vs $n")
    }
    // seasonal component is centered per type (sums to ~0 over rows)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val mean = rs.map(_.getDouble(4)).sum / rs.length
      assert(math.abs(mean) < 1e-3, s"$tpe seasonal mean $mean")
    }
  }

  test("llm_inverted_index postings are sorted and reconcile with df/cf") {
    val rows = SparkEntry.queries("llm_inverted_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1); val cf = r.getLong(2)
      // driver-facing serialization: "doc:tf,doc:tf,…" sorted by doc
      val postings = r.getString(3).split(",").toSeq.map { p =>
        val Array(doc, tf) = p.split(":"); (doc.toLong, tf.toLong)
      }
      assert(postings.length == df)
      assert(cf == postings.map(_._2).sum)
      assert(postings.map(_._1) == postings.map(_._1).sorted)
      assert(postings.map(_._1).distinct.length == postings.length)
    }
  }

  test("er_survivorship folds clusters consistently") {
    val rows = SparkEntry.queries("er_survivorship")(spark, sf).collect()
    assert(rows.nonEmpty)
    val clusters = SparkEntry.queries("er_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val cl = r.getLong(0); val n = r.getLong(2)
      val members = r.getString(3).split(",").toSeq.map(_.toLong)
      assert(members.length == n)
      assert(members.contains(cl))      // the label is a member
      assert(members.min == cl)         // and it is the minimum rid
      members.foreach(m => assert(clusters(m) == cl))
    }
    // every record lands in exactly one golden record
    assert(rows.map(_.getLong(2)).sum == clusters.size)
  }

  test("evt_forecast_backtest scores are bounded and windows sized") {
    val rows = SparkEntry.queries("evt_forecast_backtest")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 24)
      assert(r.getDouble(2) >= 0.0)
      val smape = r.getDouble(3)
      assert(smape >= 0.0 && smape <= 2.0)
    }
  }

  test("agg_tail_index: alpha inverts gamma, both positive") {
    val r = SparkEntry.queries("agg_tail_index")(spark, sf).collect()(0)
    val (gamma, alpha) = (r.getDouble(0), r.getDouble(1))
    assert(gamma > 0.0 && alpha > 0.0)
    assert(math.abs(alpha - 1.0 / gamma) < 1e-3 * alpha)
  }

  test("fn_point_in_polygon agrees with a local ray-cast and bbox bound") {
    val poly = Seq((-74.3, 40.4), (-73.5, 40.4), (-73.4, 41.0),
      (-73.9, 40.75), (-74.1, 41.1), (-74.35, 40.9))
    def inside(px: Double, py: Double): Boolean = {
      var c = 0
      for (i <- poly.indices) {
        val (x1, y1) = poly(i)
        val (x2, y2) = poly((i + 1) % poly.length)
        if (((y1 > py) != (y2 > py)) &&
          px < (x2 - x1) * (py - y1) / (y2 - y1) + x1) c += 1
      }
      c % 2 == 1
    }
    val rows = SparkEntry.queries("fn_point_in_polygon")(spark, sf).collect()
    assert(rows.nonEmpty)
    var nIn = 0
    rows.foreach { r =>
      val (px, py, in) = (r.getDouble(1), r.getDouble(2), r.getBoolean(4))
      assert(in == inside(px, py), s"point ($px, $py)")
      if (in) {
        nIn += 1
        // every inside point is inside the polygon's bounding box
        assert(px >= -74.35 && px <= -73.4 && py >= 40.4 && py <= 41.1)
      }
    }
    assert(nIn > 0, "fixture should place some points inside")
  }

  test("etl_l_diversity reconciles with a direct distinct count") {
    val r = SparkEntry.queries("etl_l_diversity")(spark, sf).collect()(0)
    val (nGroups, nRows, minL) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    assert(nRows == cust.count())
    val brute = cust.selectExpr("c_nationkey", "c_mktsegment",
        "CAST(FLOOR(CAST(ROUND(c_acctbal * 100) AS BIGINT) / 100000.0) AS BIGINT) AS b")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(org.apache.spark.sql.functions.countDistinct("b").as("l"))
      .collect()
    assert(nGroups == brute.length)
    assert(minL == brute.map(_.getLong(2)).min)
  }

  test("etl_dp_counts noise is Laplace-shaped and reproducible") {
    val a = SparkEntry.queries("etl_dp_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = SparkEntry.queries("etl_dp_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b)) // deterministic release
    a.foreach { case (p, cnt, noisy) =>
      val noise = noisy - cnt
      // Laplace(b=2): |noise| < b·ln(2^31) ≈ 43 with certainty here
      assert(math.abs(noise) < 45.0, s"$p noise $noise")
      assert(noise != 0.0)
    }
  }

  test("llm_weighted_sample favors heavy documents (E-S key law)") {
    val sample = SparkEntry.queries("llm_weighted_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sample.length == 50)
    // keys sorted descending, all negative (ln u < 0)
    assert(sample.map(_._3).toSeq == sample.map(_._3).sortBy(-_).toSeq)
    sample.foreach { case (_, _, k) => assert(k < 0.0) }
    // inclusion probability rises with weight: the sampled docs' mean
    // length exceeds the corpus mean
    val corpusMean = spark.read.parquet(s"$sf/documents.parquet")
      .agg(org.apache.spark.sql.functions.avg("n_chars")).collect()(0)
      .getDouble(0)
    val sampleMean = sample.map(_._2).sum.toDouble / sample.length
    assert(sampleMean > corpusMean, s"$sampleMean <= $corpusMean")
  }

  test("agg_spearman and agg_kendall_tau match direct local computation") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(ROUND(l_quantity) AS BIGINT) AS q",
        "CAST(ROUND(l_discount*100) AS BIGINT) AS dc")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // tie-averaged ranks
    def ranks(xs: Array[Long]): Array[Double] = {
      val byV = xs.zipWithIndex.groupBy(_._1)
      val sorted = xs.sorted
      val firstIdx = scala.collection.mutable.Map[Long, Int]()
      sorted.zipWithIndex.foreach { case (v, i) =>
        if (!firstIdx.contains(v)) firstIdx(v) = i
      }
      xs.map { v =>
        val lo = firstIdx(v) + 1; val n = byV(v).length
        lo + (n - 1) / 2.0
      }
    }
    val rq = ranks(rows.map(_._1)); val rd = ranks(rows.map(_._2))
    val n = rows.length.toDouble
    val mq = rq.sum / n; val md = rd.sum / n
    val num = rq.indices.map(i => (rq(i) - mq) * (rd(i) - md)).sum
    val den = math.sqrt(rq.map(x => (x - mq) * (x - mq)).sum *
      rd.map(x => (x - md) * (x - md)).sum)
    val rho = SparkEntry.queries("agg_spearman")(spark, sf)
      .collect()(0).getDouble(0)
    assert(math.abs(rho - num / den) < 1e-5, s"$rho vs ${num / den}")
    // Kendall tau-b via grid-free pair counting on the grouped values
    val grid = rows.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      .toArray
    var c = 0L; var dcnt = 0L
    for (((q1, d1), n1) <- grid; ((q2, d2), n2) <- grid
         if q1 < q2) {
      if (d1 < d2) c += n1 * n2
      else if (d1 > d2) dcnt += n1 * n2
    }
    val nn = rows.length.toLong
    val tq2 = rows.groupBy(_._1).values.map(g => g.length.toLong)
      .map(t => t * (t - 1)).sum
    val td2 = rows.groupBy(_._2).values.map(g => g.length.toLong)
      .map(t => t * (t - 1)).sum
    val tauB = (c - dcnt).toDouble / math.sqrt(
      (nn * (nn - 1) - tq2) / 2.0 * ((nn * (nn - 1) - td2) / 2.0))
    val got = SparkEntry.queries("agg_kendall_tau")(spark, sf).collect()(0)
    assert(got.getDouble(0) == c.toDouble && got.getDouble(1) == dcnt.toDouble)
    assert(math.abs(got.getDouble(2) - tauB) < 1e-5)
  }

  test("graph_adamic_adar only scores non-adjacent pairs, AA consistent") {
    val rows = SparkEntry.queries("graph_adamic_adar")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // reconstruct adjacency + degrees from the clustering-coeff query's
    // own deg output to cross-check the discount sum bound
    val cc = SparkEntry.queries("graph_clustering_coeff")(spark, sf)
      .collect()
    val degByName = cc.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(degByName.nonEmpty)
    rows.foreach { r =>
      val (aa, common) = (r.getDouble(2), r.getLong(3))
      assert(common >= 1)
      // each common neighbor contributes at most 1/ln(2)
      assert(aa <= common / math.log(2.0) + 1e-9)
      assert(aa > 0)
    }
    // descending score order with deterministic tiebreak
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores == scores.sortBy(-_))
  }

  test("evt_rolling_corr emits only full windows with r in [-1, 1]") {
    val rows = SparkEntry.queries("evt_rolling_corr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("etl_outlier_iqr fences bracket the bulk of each group") {
    val rows = SparkEntry.queries("etl_outlier_iqr")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getDouble(4), r.getDouble(5))
      val out = r.getLong(2) + r.getLong(3)
      assert(lo < hi)
      // Tukey fences cover at least the IQR half of the data
      assert(out < n / 2, s"${r.getString(0)}: $out of $n flagged")
    }
  }

  test("graph_temporal_reach matches a local earliest-arrival replay") {
    val got = SparkEntry.queries("graph_temporal_reach")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDate(1).toString).toMap
    assert(got.nonEmpty)
    // local replay on the collected month-granular edge list
    val edges = spark.sql("SELECT 1").sparkSession.read
      .parquet(s"$sf/lineitem.parquet").alias("l")
      .join(spark.read.parquet(s"$sf/orders.parquet").alias("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .join(spark.read.parquet(s"$sf/customer.parquet").alias("c"),
        col("o.o_custkey") === col("c.c_custkey"))
      .join(spark.read.parquet(s"$sf/supplier.parquet").alias("s"),
        col("l.l_suppkey") === col("s.s_suppkey"))
      .selectExpr("c.c_nationkey AS src", "s.s_nationkey AS dst",
        "CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m")
      .distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDate(2).toString))
    val names = spark.read.parquet(s"$sf/nation.parquet").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val m0 = edges.map(_._3).min
    val arr = scala.collection.mutable.Map(0 -> m0)
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (s_, d_, m) =>
        if (arr.contains(s_) && m >= arr(s_) &&
          arr.get(d_).forall(m < _)) { arr(d_) = m; changed = true }
      }
    }
    assert(got == arr.map { case (k, v) => names(k) -> v }.toMap)
  }

  test("ml_precision_at_k reconciles with llm_cosine_topk's neighbors") {
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val top5 = SparkEntry.queries("llm_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = SparkEntry.queries("ml_precision_at_k")(spark, sf).collect()
    assert(got.length == 20)
    got.foreach { r =>
      val (qid, qlabel, hits, p5) = (r.getLong(0), r.getInt(1),
        r.getLong(2), r.getDouble(3))
      assert(qlabel == labels(qid))
      val expectHits = top5(qid).count(c => labels(c) == qlabel)
      assert(hits == expectHits, s"query $qid")
      assert(math.abs(p5 - hits / 5.0) < 1e-9)
    }
  }

  test("evt_changepoint picks the argmax split per type (local replay)") {
    val got = SparkEntry.queries("evt_changepoint")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDate(1).toString, r.getDouble(4)))
      .toMap
    assert(got.nonEmpty)
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type",
        "CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS dy",
        "CAST(ROUND(value*100) AS BIGINT) AS v")
      .groupBy("event_type", "dy")
      .agg(org.apache.spark.sql.functions.sum("v").as("sv"),
        org.apache.spark.sql.functions.count(col("v")).as("nv"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3)))
      .groupBy(_._1)
    daily.foreach { case (tpe, rows) =>
      val sorted = rows.sortBy(_._2)
      val totS = sorted.map(_._3).sum.toDouble
      val totN = sorted.map(_._4).sum.toDouble
      var cs = 0.0; var cn = 0.0
      var best = (-1.0, "")
      sorted.init.foreach { case (_, day, sv, nv) =>
        cs += sv; cn += nv
        val stat = math.abs(cs / cn - (totS - cs) / (totN - cn)) *
          math.sqrt(cn * (totN - cn) / totN)
        val rs = math.rint(stat * 1e6) / 1e6
        if (rs > best._1) best = (rs, day)
      }
      assert(got(tpe)._1 == best._2, s"$tpe split ${got(tpe)._1} vs $best")
      assert(math.abs(got(tpe)._2 - best._1) < 1e-5)
    }
  }

  test("evt_mann_kendall: S bounded by pair count, z sign follows S") {
    val rows = SparkEntry.queries("evt_mann_kendall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s_, m, varS, z) = (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))
      assert(math.abs(s_) <= m * (m - 1) / 2)
      assert(varS > 0)
      assert(z.sign == s_.sign.toDouble || s_ == 0 && z == 0.0)
      val expect =
        if (s_ > 0) (s_ - 1).toDouble / math.sqrt(varS)
        else if (s_ < 0) (s_ + 1).toDouble / math.sqrt(varS)
        else 0.0
      assert(math.abs(z - expect) < 1e-4, s"${r.getString(0)}")
    }
  }

  test("llm_bigram_lm: held-out only, ppl above 1, bigram counts sane") {
    val rows = SparkEntry.queries("llm_bigram_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (id, nb, ppl) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(id % 5 == 0, "train doc leaked into scoring")
      assert(nb == toks(id) - 1, s"doc $id bigrams $nb vs ${toks(id) - 1}")
      assert(ppl > 1.0)
    }
  }

  test("ml_power_iteration replays against a local 3-step power method") {
    val r = SparkEntry.queries("ml_power_iteration")(spark, sf).collect()(0)
    val (l1, evr, tr) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(l1 > 0 && tr > 0 && evr > 0 && evr <= 1.0)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val n = vecs.length; val dim = 64
    val mu = Array.tabulate(dim)(i => vecs.map(_(i).toDouble).sum / n)
    val c = Array.tabulate(dim, dim) { (i, j) =>
      math.rint((vecs.map(v => v(i).toDouble * v(j)).sum / n
        - mu(i) * mu(j)) * 1e8) / 1e8
    }
    var v = Array.fill(dim)(0.125)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val cv = Array.tabulate(dim)(i => (0 until dim).map(j => c(i)(j) * v(j)).sum)
    val lam = (0 until dim).map(i => v(i) * cv(i)).sum
    val trace = (0 until dim).map(i => c(i)(i)).sum
    assert(math.abs(l1 - lam) < 1e-3, s"$l1 vs $lam")
    assert(math.abs(tr - trace) < 1e-3)
  }

  test("llm_random_projection matches local recomputation, signs balanced") {
    val got = SparkEntry.queries("llm_random_projection")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .where("vec_id < 100").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    assert(got.size == vecs.length * 8)
    def sgn(i: Int, j: Int): Int = {
      val m = i * 37 + j * 101 + 7
      1 - 2 * ((m * m) % 97 % 2)
    }
    // sign matrix should be roughly balanced (not rank-structured):
    val signs = for (i <- 0 until 64; j <- 0 until 8) yield sgn(i, j)
    val plus = signs.count(_ == 1)
    assert(plus > 160 && plus < 352, s"sign balance $plus/512")
    vecs.foreach { case (id, v) =>
      for (j <- 0 until 8) {
        val p = v.indices.map(i => v(i).toDouble * sgn(i, j)).sum /
          math.sqrt(8.0)
        assert(math.abs(got((id, j)) - p) < 1e-5,
          s"vec $id dim $j: ${got((id, j))} vs $p")
      }
    }
  }
}
