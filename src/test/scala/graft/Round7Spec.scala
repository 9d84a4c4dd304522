package graft

import org.scalatest.funsuite.AnyFunSuite

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
