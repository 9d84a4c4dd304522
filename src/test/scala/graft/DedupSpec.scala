package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextOps}

/** Validates the approximate dedup family against the exact-Jaccard
  * ground truth (the oracle-checked `llm_ngram_jaccard`). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("MinHash recalls most true near-dup pairs, with sane precision") {
    val exact = TextOps.defs("llm_ngram_jaccard")(spark, sf)
      .select(col("doc1"), col("doc2"), col("jaccard"))
    val truth = exact.filter(col("jaccard") >= 0.3)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashPairs(spark, sf, maxDist = 0.8)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-dup pairs")
    val recalled = truth.intersect(mh).size.toDouble / truth.size
    assert(recalled >= 0.8, s"MinHash recall too low: $recalled (|truth|=${truth.size}, |mh|=${mh.size})")
  }

  test("native banded MinHash: near-exact recall, no false positives") {
    val exact = TextOps.defs("llm_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.3)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = Dedup.minhashPairsNative(spark, sf, threshold = 0.3)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidates are exact-verified, so no false positives are possible;
    // misses only come from banding (P_miss ≤ (1-0.3)^16 ≈ 0.3%)
    assert(native.subsetOf(exact), s"false positives: ${native -- exact}")
    val recall = exact.intersect(native).size.toDouble / exact.size
    assert(recall >= 0.95, s"native MinHash recall too low: $recall")
  }

  test("SimHash hamming distance correlates with similarity") {
    val sim = TextOps.defs("llm_simhash")(spark, sf)
    // near-dup pairs (exact jaccard >= 0.3) should have smaller hamming
    // distance on average than random pairs
    val exact = TextOps.defs("llm_ngram_jaccard")(spark, sf)
    val withSig = exact
      .join(sim.select(col("doc_id").as("doc1"), col("simhash").as("s1")), Seq("doc1"))
      .join(sim.select(col("doc_id").as("doc2"), col("simhash").as("s2")), Seq("doc2"))
      .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
    val nearAvg = withSig.filter(col("jaccard") >= 0.3)
      .agg(avg("hamming")).collect()(0).getDouble(0)
    val sigs = sim.orderBy("doc_id").limit(60).collect().map(_.getLong(1))
    val randAvg = sigs.sliding(2).map { case Array(a, b) =>
      java.lang.Long.bitCount(a ^ b).toDouble }.toSeq
    val randMean = randAvg.sum / randAvg.size
    assert(nearAvg < randMean,
      s"near-dup hamming ($nearAvg) should beat random-pair hamming ($randMean)")
  }

  test("dedup_apply keeps exactly one representative per connected component") {
    val kept = Dedup.defs("llm_dedup_apply")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val total = graft.core.Tables.t(spark, sf, "documents").count()
    val pairs = Dedup.minhashPairsNative(spark, sf, 0.3)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find ground truth over the candidate graph
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val inGraph = parent.keySet.toSet
    val componentMins = inGraph.groupBy(find).map(_._2.min).toSet
    val expectedKept = total - inGraph.size + componentMins.size
    assert(kept.size == expectedKept,
      s"${kept.size} survivors vs expected $expectedKept")
    // every component's minimum survives; no other member does
    assert(componentMins.subsetOf(kept))
    assert((inGraph -- componentMins).intersect(kept).isEmpty)
  }
}
