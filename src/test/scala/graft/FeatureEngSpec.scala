package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Edge semantics of the feature-engineering family
  * (queries/FeatureEng.scala). The DuckDB oracle value-checks every query
  * on the real tables; these tests pin the statistical contracts the hash
  * can't express: LOO really excludes self, imputation only touches
  * masked rows, z-scores re-standardize to (0, 1), winsorization clamps
  * to the emitted cutoffs.
  */
class FeatureEngSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("target encode: LOO replays from raw sums and excludes self") {
    val enc = SparkEntry.queries("ml_target_encode")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val raw = graft.core.Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("bigint").as("tp_u"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byCat = raw.groupBy(_._2).view.mapValues(rs =>
      (rs.map(_._3).sum, rs.length)).toMap
    raw.take(200).foreach { case (k, cat, tp) =>
      val (s, n) = byCat(cat)
      val want = (s - tp).toDouble / ((n - 1) * 100.0)
      val (gotCat, got) = enc(k)
      assert(gotCat == cat)
      assert(math.abs(got - want) < 1e-3, s"order $k LOO mismatch")
      // self-exclusion: a max-valued row must encode strictly below the
      // plain category mean (its own high value no longer pulls it up)
    }
    val (maxK, maxCat, _) = raw.maxBy(_._3)
    val (s, n) = byCat(maxCat)
    assert(enc(maxK)._2 < s.toDouble / (n * 100.0), "self not excluded")
  }

  test("feature hash: slots bounded, signs ±1, load accounts the map") {
    val rows = SparkEntry.queries("ml_feature_hash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("slot") >= 0 && r.getAs[Long]("slot") < 64)
      assert(math.abs(r.getAs[Long]("sign")) == 1)
    }
    val loads = rows.groupBy(_.getAs[Long]("slot"))
    loads.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("slot_load")).distinct.length == 1)
      assert(rs.head.getAs[Long]("slot_load") == rs.length.toLong,
        "slot_load must count the distinct features hashed into the slot")
    }
  }

  test("winsorize: emits exactly the out-of-band rows, clamped to cuts") {
    val rows = SparkEntry.queries("etl_winsorize")(spark, sf).collect()
    assert(rows.nonEmpty)
    val clamped = rows.map(_.getAs[Double]("winsorized"))
    val lo = clamped.min; val hi = clamped.max
    rows.foreach { r =>
      val x = r.getAs[Double]("totalprice")
      val w = r.getAs[Double]("winsorized")
      assert(x < lo || x > hi, "an in-band row was emitted")
      assert(w == (if (r.getAs[Boolean]("clipped_low")) lo else hi),
        "winsorized value is not the nearer cutoff")
    }
    // p05/p95 cutoffs: the emitted set is ~10% of orders (ties can nudge it)
    val n = graft.core.Tables.t(spark, sf, "orders").count()
    assert(rows.length <= 0.11 * n && rows.length >= 0.08 * n)
  }

  test("impute: only masked rows change, fill is the surviving-mean") {
    val out = SparkEntry.queries("etl_impute")(spark, sf).collect()
    val raw = graft.core.Tables.t(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val missFrac = out.count(_.getAs[Boolean]("was_missing")).toDouble / out.length
    assert(missFrac > 0.05 && missFrac < 0.15, s"mask fraction $missFrac")
    out.filter(!_.getAs[Boolean]("was_missing")).foreach { r =>
      assert(math.abs(r.getAs[Double]("acctbal_imputed") -
        raw(r.getAs[Long]("c_custkey"))._2) < 0.005,
        "an observed value was altered")
    }
    // every imputed value within a nation is the same single mean
    out.filter(_.getAs[Boolean]("was_missing"))
      .groupBy(_.getAs[Int]("nationkey")).foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Double]("acctbal_imputed")).distinct.length == 1)
      }
  }

  test("scale: z-scores re-standardize to mean 0 / sd 1 per nation") {
    val rows = SparkEntry.queries("ml_scale")(spark, sf).collect()
    val mmAll = rows.map(_.getAs[Double]("minmax"))
    assert(mmAll.min == 0.0 && mmAll.max == 1.0, "min-max range endpoints")
    rows.groupBy(_.getAs[Int]("nationkey")).foreach { case (nk, rs) =>
      val zs = rs.map(_.getAs[Double]("zscore"))
      val n = zs.length
      if (n > 1) {
        val mean = zs.sum / n
        val sd = math.sqrt(zs.map(z => (z - mean) * (z - mean)).sum / (n - 1))
        assert(math.abs(mean) < 1e-3, s"nation $nk z mean $mean")
        assert(math.abs(sd - 1.0) < 1e-2, s"nation $nk z sd $sd")
      }
    }
  }
}
