package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Semantics checks for the r7 additions (Semantic.scala +
  * Hypothesis.scala) against independent brute-force computations on the
  * collected sf0.001 fixture — the value-level parity lives in the
  * DuckDB oracle; these pin the algorithmic contracts. */
class SemanticSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  private lazy val vecs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("kmeans assignment picks the argmax-cosine centroid") {
    val cents = vecs.filter(_._1 < 16)
    val got = SparkEntry.queries("llm_kmeans_assign")(spark, sf)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == vecs.size)
    got.foreach { case (id, cell) =>
      val best = cents.map { case (c, cv) =>
        (math.rint(cos(vecs(id), cv) * 1e6) / 1e6, -c)
      }.max
      assert(-best._2 == cell, s"vec $id assigned $cell, brute ${-best._2}")
    }
  }

  test("semdedup removes exactly the within-cell dominated vectors") {
    val cells = SparkEntry.queries("llm_kmeans_assign")(spark, sf)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedRemoved = vecs.keySet.filter { id =>
      vecs.keySet.exists(o =>
        o < id && cells(o) == cells(id) && cos(vecs(o), vecs(id)) >= 0.30)
    }
    val got = SparkEntry.queries("llm_semdedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got.filterNot(_._2).keySet == expectedRemoved)
  }

  private def clusterQuality(assign: Map[Long, Long]): Double = {
    // self-consistent k-means quality: mean cosine of each vector to the
    // mean of its assigned cluster
    val centroids = assign.groupBy(_._2).map { case (cell, members) =>
      val vs = members.keys.map(vecs).toArray
      val m = new Array[Float](vs.head.length)
      vs.foreach(v => (0 until m.length).foreach(i => m(i) += v(i) / vs.length))
      cell -> m
    }
    assign.map { case (id, cell) => cos(vecs(id), centroids(cell)) }
      .sum / assign.size
  }

  test("kmeans iterate does not degrade cluster quality vs one step") {
    def collectAssign(name: String) =
      SparkEntry.queries(name)(spark, sf).select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val step1 = collectAssign("llm_kmeans_assign")
    val iter = collectAssign("llm_kmeans_iterate")
    assert(iter.keySet == vecs.keySet)
    assert(iter.values.toSet.forall(c => c >= 0 && c < 16))
    assert(clusterQuality(iter) >= clusterQuality(step1) - 1e-9,
      "3 Lloyd rounds should not lose quality vs the seed assignment")
  }

  test("rouge pair scores are valid and self-consistent with jaccard-like bounds") {
    val rows = SparkEntry.queries("llm_rouge_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 45) // full doc_id<10 pair grid
    rows.foreach { case (a, b, f1, f2) =>
      assert(a < b)
      assert(f1 >= 0.0 && f1 <= 1.0 && f2 >= 0.0 && f2 <= 1.0)
      // bigram overlap can't beat unigram overlap by much: rouge2 <= rouge1
      // holds on whitespace tokens because every shared bigram implies two
      // shared unigram instances
      assert(f2 <= f1 + 1e-9, s"pair ($a,$b): rouge2 $f2 > rouge1 $f1")
    }
  }

  test("cuped keeps the mean and reduces variance") {
    val rows = SparkEntry.queries("agg_cuped")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(rows.length == 2)
    rows.foreach { case (_, n, meanY, meanCuped, reduction) =>
      assert(n > 0)
      // CUPED shifts each variant's mean only through the shared -θ(X̄_v−X̄)
      // term — small relative to the metric itself on this fixture
      assert(math.abs(meanCuped - meanY) < math.abs(meanY),
        "adjusted mean should stay in the metric's range")
      assert(reduction > -1.0 && reduction < 1.0)
    }
    // pooled θ explains real variance on at least one variant
    assert(rows.map(_._5).max > 0.0, "CUPED should reduce variance somewhere")
  }

  test("ccnet buckets are per-lang terciles ordered head >= tail") {
    val rows = SparkEntry.queries("llm_ccnet_buckets")(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._3).view.mapValues(_.size)
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang tercile sizes $sizes")
      val head = rs.filter(_._3 == "head").map(_._2)
      val tail = rs.filter(_._3 == "tail").map(_._2)
      assert(head.min >= tail.max, s"$lang head/tail overlap")
    }
  }

  test("dsir weights rank the target slice above the rest on average") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "source").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val w = SparkEntry.queries("llm_dsir_weights")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2).toDouble) // ppb ints since r12
    val (tgt, rest) = w.partition { case (id, _) =>
      val (lang, src) = docs(id)
      lang == "en" && Set("src0", "src1", "src2", "src3")(src)
    }
    assert(tgt.nonEmpty && rest.nonEmpty)
    assert(tgt.map(_._2).sum / tgt.size > rest.map(_._2).sum / rest.size,
      "target slice should score higher under its own distribution")
  }

  test("mann-whitney matches a direct rank-sum computation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT) AS v",
        "l_returnflag").collect()
      .collect { case r: Row if r.getString(1) == "A" || r.getString(1) == "R" =>
        (r.getLong(0), r.getString(1) == "A") }
    val sorted = li.sortBy(_._1)
    // tie-averaged ranks
    var i = 0; var r1 = 0.0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val avgRank = (i + 1 + j) / 2.0 // mean of ranks i+1..j
      (i until j).foreach(k => if (sorted(k)._2) r1 += avgRank)
      i = j
    }
    val n1 = li.count(_._2).toLong
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val row = SparkEntry.queries("agg_mannwhitney")(spark, sf).collect()(0)
    assert(row.getLong(0) == n1)
    assert(math.abs(row.getDouble(2) - u1) < 1e-6,
      s"u1 ${row.getDouble(2)} vs brute $u1")
  }

  test("bh rejections are a prefix of the p-sorted metrics") {
    val rows = SparkEntry.queries("agg_fdr_bh")(spark, sf).collect()
      .map(r => (r.getInt(3), r.getDouble(2), r.getBoolean(4)))
      .sortBy(_._1)
    val m = rows.length
    val kmax = rows.filter { case (k, p, _) => p * m <= 0.10 * k }
      .map(_._1).maxOption.getOrElse(0)
    rows.foreach { case (k, _, rej) => assert(rej == (k <= kmax)) }
  }

  test("kaplan-meier curve is a valid survival function") {
    val rows = SparkEntry.queries("evt_kaplan_meier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((_, n1, _, s1), (_, n2, _, s2)) =>
        assert(n2 <= n1, "at-risk must be non-increasing")
        assert(s2 <= s1 + 1e-12, "survival must be non-increasing")
      case _ =>
    }
    rows.foreach { case (_, n, d, s) =>
      assert(d > 0 && d <= n && s >= 0.0 && s <= 1.0)
    }
  }

  test("fuzzy levenshtein pairs are same-noun, lev<=3, canonical order") {
    val rows = SparkEntry.queries("join_fuzzy_levenshtein")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, lev) =>
      assert(a < b)
      assert(a.split(' ').last == b.split(' ').last)
      assert(lev <= 3 && lev > 0)
    }
  }
}
