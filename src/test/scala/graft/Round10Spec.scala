package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Contracts for the r10 additions.
  *
  * The sf fixture gives evt_shapley_attribution a DEGENERATE game (every
  * user touches all four channels, so the value is symmetric by
  * construction and each channel gets exactly conv/4) — the crafted
  * fixture here exercises the asymmetric case and checks the two Shapley
  * axioms the implementation must satisfy: EFFICIENCY (Σφ = v(full) −
  * v(∅)) and the exact per-channel values against a from-scratch lattice
  * solver. Katz and the portable Poisson fit get driver-side replays.
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  private def writeEvents(rows: Seq[(Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r10").toString
    rows.map { case (eid, uid, et) =>
      (eid, new java.sql.Timestamp(1700000000000L + eid * 1000), uid, et,
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("shapley attribution: exact lattice values + efficiency axiom on an asymmetric game") {
    // crafted journeys: click converts alone, view converts only WITH
    // click, error never converts, signup unseen
    val rows = Seq(
      // uid 1: click -> purchase
      (1L, 1L, "click"), (2L, 1L, "purchase"),
      // uid 2: click -> purchase
      (3L, 2L, "click"), (4L, 2L, "purchase"),
      // uid 3: click, no purchase
      (5L, 3L, "click"),
      // uid 4: view only, no purchase
      (6L, 4L, "view"),
      // uid 5: click + view -> purchase
      (7L, 5L, "click"), (8L, 5L, "view"), (9L, 5L, "purchase"),
      // uid 6: error only, no purchase
      (10L, 6L, "error"))
    val dir = writeEvents(rows)
    val got = SparkEntry.queries("evt_shapley_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // from-scratch lattice solver (bit order: click 1, error 2,
    // signup 4, view 8)
    val users = Seq((1, true), (1, true), (1, false), (8, false),
      (9, true), (2, false))
    def v(st: Int): Double = {
      val in = users.filter { case (m, _) => (m & st) == m }
      if (in.isEmpty) 0.0
      else in.count(_._2).toDouble / in.size
    }
    val w24 = Seq(6, 2, 2, 6)
    val chans = Seq("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)
    val want = chans.map { case (name, cb) =>
      name -> (0 until 16).filter(st => (st & cb) == 0).map { st =>
        math.floor(1e6 * w24(Integer.bitCount(st)) * (v(st + cb) - v(st))
          + 0.5).toLong
      }.sum
    }.toMap
    assert(got == want, s"got $got want $want")
    // efficiency: Σφ/24 = v(15) − v(0) (both in ppm, ±4 for the 32
    // per-term floors)
    val eff = got.values.sum / 24.0
    val vdiff = 1e6 * (v(15) - v(0))
    assert(math.abs(eff - vdiff) < 4.0, s"efficiency: $eff vs $vdiff")
    // asymmetry: click carries more credit than error (which never
    // converts) — the axiom the equal-touch heuristics break
    assert(got("click") > got("error"))
  }

  test("katz centrality: base-mass floor, full node set, and in-degree monotonicity") {
    val got = SparkEntry.queries("graph_katz")(spark, sf)
      .select("node", "katz_ppb").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // x = 1 + α·Aᵀx from x = 1e9: every node keeps at least the base
    // mass exactly (nodes with no in-edges sit at exactly 1e9), and a
    // node with any in-edge exceeds it
    assert(got.size == 25)
    assert(got.values.forall(_ >= 1000000000L))
    assert(got.values.exists(_ > 1000000000L),
      "the trade graph has edges; someone must accumulate walk mass")
    // the oracle twin replays the identical integer trajectory, so the
    // value-level check lives in CORRECTNESS; this spec pins the
    // structural contract only
  }

  test("poisson fit: totals match exactly and the link inverts the seed") {
    val r = SparkEntry.queries("ml_poisson_reg")(spark, sf).head()
    val w0 = r.getDouble(0); val fitRatio = r.getLong(3)
    // the sqrt-seeded intercept keeps the mean-rate property through
    // Newton: fitted total / observed total stays 1e6 ppm (exact match)
    assert(fitRatio == 1000000L, s"fit_ratio_ppm $fitRatio")
    // w0 near log(mean quantity) — loose sanity band
    assert(w0 > 2.0 && w0 < 4.5, s"w0 $w0")
  }
}
