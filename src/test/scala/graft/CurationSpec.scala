package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.Curation

/** Pins the round-6 curation operators on crafted fixtures, independent of
  * the DuckDB twins: the winnowing guarantee (a shared substring of length
  * ≥ k+w-1 yields a shared fingerprint), substring-dup pair detection with
  * the boilerplate cutoff, the per-source cap, and mixture-weight algebra.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-curation").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("winnowing: docs sharing a >=11-char substring share a fingerprint") {
    val shared = "the quick brown fox jumps" // 25 chars, >> k+w-1 = 11
    val dir = writeDocs(Seq(
      (1L, s"alpha beta $shared gamma delta", "s"),
      (2L, s"unrelated prefix text $shared and a different tail", "s"),
      (3L, "completely different content with no overlap at all", "s")))
    val fps = Curation.defs("llm_winnow_fingerprint")(spark, dir)
    val rows = fps.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    // density sanity: winnowing keeps far fewer than all grams
    assert(rows(1L)._1 > 0 && rows(1L)._1 < 30)
    // the guarantee itself needs the fingerprint SETS: recompute them
    // via the same public query on single-doc fixtures and intersect
    // the aggregated query exposes only (count, min, max, modsum); the
    // set-level guarantee is checked against the same array pipeline
    def fpSet(text: String): Set[Long] = {
      val d1 = writeDocs(Seq((9L, text, "s")))
      spark.read.parquet(s"$d1/documents.parquet")
        .selectExpr(
          "transform(sequence(1, length(text) - 7), p -> (" +
            "CAST(ascii(substring(text, p, 1)) AS BIGINT) * 27512614111 + " +
            "CAST(ascii(substring(text, p + 1, 1)) AS BIGINT) * 887503681 + " +
            "CAST(ascii(substring(text, p + 2, 1)) AS BIGINT) * 28629151 + " +
            "CAST(ascii(substring(text, p + 3, 1)) AS BIGINT) * 923521 + " +
            "CAST(ascii(substring(text, p + 4, 1)) AS BIGINT) * 29791 + " +
            "CAST(ascii(substring(text, p + 5, 1)) AS BIGINT) * 961 + " +
            "CAST(ascii(substring(text, p + 6, 1)) AS BIGINT) * 31 + " +
            "CAST(ascii(substring(text, p + 7, 1)) AS BIGINT)) % 1000000007) AS hs")
        .selectExpr("explode(array_distinct(transform(sequence(1, size(hs) - 3), i -> array_min(slice(hs, i, 4))))) AS fp")
        .collect().map(_.getLong(0)).toSet
    }
    val s1 = fpSet(s"alpha beta $shared gamma delta")
    val s2 = fpSet(s"unrelated prefix text $shared and a different tail")
    val s3 = fpSet("completely different content with no overlap at all")
    assert((s1 & s2).nonEmpty, "shared 25-char substring must share a fingerprint")
    assert((s1 & s3).isEmpty, "disjoint texts should not collide on this fixture")
  }

  test("substring_dup: finds the planted near-pair, cutoff drops boilerplate") {
    val dup = "this exact sentence is duplicated across the pair of documents"
    val boiler = "standard footer all rights reserved contact us today" // in ALL docs
    val docs = Seq(
      (1L, s"one $dup padding tail one $boiler", "s"),
      (2L, s"two leading words $dup other tail $boiler", "s")) ++
      (3L to 14L).map(i => (i, s"doc number $i unique content here $boiler", "s"))
    val dir = writeDocs(docs.map { case (a, b, c) => (a.toLong, b, c) })
    val pairs = Curation.defs("llm_substring_dup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"planted dup pair missing: $pairs")
    // the boilerplate footer appears in 14 docs > cutoff 10, so no pair
    // may exist that is explained ONLY by the footer
    assert(pairs.keySet == Set((1L, 2L)),
      s"boilerplate-only pairs must be cut off: $pairs")
  }

  test("domain_cap: keeps top-5 per source by n_chars with doc_id tiebreak") {
    val docs = (1L to 8L).map(i => (i, "x" * (10 + i.toInt), "a")) ++
      Seq((20L, "short", "b"))
    val dir = writeDocs(docs)
    val out = Curation.defs("llm_domain_cap")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((8L, 5L, (14L to 18L).sum))) // lengths 18..14 kept
    assert(out("b") == ((1L, 1L, 5L)))
  }

  test("blocklist_filter: dense-hit doc dropped, light doc kept, counts exact") {
    val dir = writeDocs(Seq(
      (1L, "slow merge stream slow merge stream slow merge", "s"), // 8 toks, 8 hits
      (2L, "clean words only here nothing blocked at all whatsoever ok", "s"),
      (3L, "one slow token among twenty other perfectly ordinary harmless " +
        "words that keep going on and on and on and on", "s")))
    val out = Curation.defs("llm_blocklist_filter")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(5))).toMap
    assert(out(1L) == ((8, 8, 3, false)), s"dense doc must be dropped: ${out(1L)}")
    assert(out(2L)._2 == 0 && out(2L)._4, "clean doc must be kept with 0 hits")
    assert(out(3L)._2 == 1 && out(3L)._3 == 1 && !out(3L)._4 == (1.0 / out(3L)._1 >= 0.05))
  }

  test("mixture_weights: weights sum to 1, epochs = budget*weight/tokens") {
    val dir = writeDocs(Seq(
      (1L, "a b c d", "s0"), (2L, "e f g h i j k l", "s0"),
      (3L, "m n o p", "s1")))
    val out = Curation.defs("llm_mixture_weights")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val wSum = out.values.map(_._2).sum
    assert(math.abs(wSum - 1.0) < 1e-5, s"weights must sum to 1: $wSum")
    // s0: 12 tokens, s1: 4 tokens; sqrt scaling: sqrt(12):sqrt(4) = 0.634:0.366
    assert(math.abs(out("s0")._2 - math.sqrt(12.0) / (math.sqrt(12.0) + 2.0)) < 1e-5)
    out.foreach { case (_, (tok, w, ep)) =>
      assert(math.abs(ep - 1000000.0 * w / tok) < 1.0) // round(,6) slack
    }
  }
}
