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
