package graft.llm

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables.{spread, t}
import graft.functions.GraftFunctions

/** Approximate dedup family for 100 TB corpora (BASELINE.json north_star).
  * Exact anchors (md5 group, exact n-gram Jaccard) live in [[TextOps]];
  * this file holds the scale paths:
  *
  *  - native banded MinHash (primary, [[minhashPairsNative]]): shingle
  *    hashes → minhash16 UDAF signature → r=1/b=16 bucket join → exact
  *    verification on candidates only, so cost is O(near-dup pairs), not
  *    O(n²). The `spark.ml.feature.MinHashLSH` variant ([[minhashPairs]])
  *    is kept as a cross-check.
  *  - SimHash: in [[TextOps]] (`llm_simhash`); signature clustering here.
  *  - Embedding near-dup: cosine ≥ threshold via the LSH signature join
  *    from [[SimSearch]].
  *
  * All are rows-only for the driver oracle (hash functions are
  * engine-specific); `DedupSpec` validates them against the exact-Jaccard
  * ground truth.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  /** Native banded MinHash near-dup pairs: shingles → xxhash64 → 16-perm
    * signature via the [[graft.functions.Aggregators.MinHashAgg]] UDAF →
    * r=1, b=16 banding (candidate iff ANY position agrees:
    * P = 1 − (1−J)^16, so J ≥ 0.3 is caught with ≥ 99.7%) → exact Jaccard
    * verification restricted to candidate pairs only.
    *
    * This is the 100 TB shape: one aggregate to build signatures, one
    * equi-join on (position, minhash) buckets, and the quadratic exact
    * check runs only on the candidate set instead of all pairs. */
  def minhashPairsNative(s: SparkSession, d: String,
                         threshold: Double = 0.2): DataFrame = {
    graft.functions.Aggregators.register(s)
    val sh = TextOps.shingles(s, d)
      .withColumn("h", xxhash64(col("shingle")))
    val sigs = sh.groupBy(col("doc_id"))
      .agg(expr("minhash16(h)").as("sig"), count(lit(1)).as("n_sh"))
    val banded = sigs.select(col("doc_id"),
      posexplode(col("sig")).as(Seq("band", "minh")))
    val cands = banded.select(col("doc_id").as("doc1"), col("band"), col("minh"))
      .join(banded.select(col("doc_id").as("doc2"), col("band"), col("minh")),
        Seq("band", "minh"))
      .filter(col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
    // exact verification on candidates only
    val common = cands
      .join(sh.select(col("doc_id").as("doc1"), col("h")), Seq("doc1"))
      .join(sh.select(col("doc_id").as("doc2"), col("h")), Seq("doc2", "h"))
      .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("common"))
    val n = sigs.select(col("doc_id"), col("n_sh"))
    common
      .join(n.select(col("doc_id").as("doc1"), col("n_sh").as("n1")), Seq("doc1"))
      .join(n.select(col("doc_id").as("doc2"), col("n_sh").as("n2")), Seq("doc2"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("n1") + col("n2") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), col("jaccard"))
  }

  /** spark.ml MinHashLSH variant (kept as a cross-check of the native
    * implementation; see DedupSpec). Deterministic: seed fixed. */
  def minhashPairs(s: SparkSession, d: String, maxDist: Double = 0.8): DataFrame = {
    val sh = TextOps.shingles(s, d)
      .groupBy(col("doc_id")).agg(collect_list(col("shingle")).as("sh"))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18)
    val feats = tf.transform(sh)
      // MinHashLSH requires at least one non-zero entry
      .filter(udf((v: SparseVector) => v.numNonzeros > 0).apply(col("features")))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, maxDist, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("doc1"),
        col("datasetB.doc_id").as("doc2"),
        col("jaccard_dist"))
      .filter(col("doc1") < col("doc2"))
  }

  val defs: Map[String, Q] = Map(
    // near-dup pairs via native banded MinHash (Jaccard ≥ 0.2)
    "llm_minhash_pairs" -> ((s, d) => minhashPairsNative(s, d)),

    // duplicate clusters: connected doc groups sharing a SimHash signature
    "llm_simhash_clusters" -> ((s, d) => {
      val sim = TextOps.defs("llm_simhash")(s, d)
      sim.groupBy(col("simhash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"),
          array_sort(collect_list(col("doc_id"))).as("members"))
        .filter(col("n_docs") > 1)
    }),

    // embedding near-dup: cosine ≥ 0.95 within multi-table LSH buckets
    "llm_embedding_neardup" -> ((s, d) => {
      GraftFunctions.register(s)
      val emb = SimSearch.signatures(spread(t(s, d, "embeddings")))
      val a = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"),
        explode(col("sigs")).as("sig"))
      val b = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"),
        explode(col("sigs")).as("sig"))
      a.join(b, Seq("sig"))
        .filter(col("id1") < col("id2"))
        // cosine before dedup: cheaper than shuffling arrays (see ann_lsh)
        .withColumn("cos", expr("cosine_similarity(v1, v2)"))
        .filter(col("cos") >= 0.95)
        .select(col("id1"), col("id2"), col("cos"))
        .dropDuplicates("id1", "id2")
    }),

    // dedup EXECUTION (not just detection): exactly ONE survivor per
    // connected near-dup component — iterative min-label propagation over
    // the candidate-pair graph (the standard distributed
    // connected-components loop: one edge-join shuffle per iteration;
    // near-dup clusters are clique-like, so few iterations converge).
    "llm_dedup_apply" -> ((s, d) => {
      val pairs = minhashPairsNative(s, d, threshold = 0.3)
        .select(col("doc1"), col("doc2"))
      // materialize the candidate graph ONCE: without cutting lineage every
      // label iteration would re-execute the whole MinHash DAG (and the
      // plan would grow per iteration) — localCheckpoint truncates it
      val edges = pairs.union(
        pairs.select(col("doc2").as("doc1"), col("doc1").as("doc2")))
        .localCheckpoint()
      val docs = t(s, d, "documents")
      var labels = docs.select(col("doc_id"), col("doc_id").as("label"))
        .localCheckpoint()
      for (_ <- 1 to 5) {
        val nbrMin = edges
          .join(labels.select(col("doc_id").as("doc2"), col("label").as("nbl")),
            Seq("doc2"))
          .groupBy(col("doc1")).agg(min(col("nbl")).as("nbr_min"))
          .select(col("doc1").as("doc_id"), col("nbr_min"))
        labels = labels.join(nbrMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("label"), coalesce(col("nbr_min"), col("label")))
              .as("label"))
          .localCheckpoint()
      }
      docs.join(labels.filter(col("doc_id") === col("label"))
          .select(col("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    })
  )

  val sql: Map[String, String] = Map.empty // engine-specific hashes: rows-only
}
