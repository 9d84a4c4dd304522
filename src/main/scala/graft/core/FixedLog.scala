package graft.core

/** Engine-portable FIXED-POINT natural log over positive BIGINTs
  * (r14, VERDICT r13 #7).
  *
  * The DSIR λ table was the last libm exposure on the board: both Spark
  * and DuckDB computed `floor(1e9·(ln a − ln b) + 0.5)` with their own
  * `ln`, each allowed ~1 ulp, so the floored integer could differ by 1
  * whenever the true value landed within ~1e-6 of an integer — a known,
  * quantified, but nonzero cross-engine hazard (ADVICE r12/r13). This
  * kernel replaces `ln` with a bit-by-bit INTEGER algorithm emitted as
  * SQL text for both engines from the same per-step expression strings,
  * so the result is bit-identical BY CONSTRUCTION: every operation is
  * integer multiply/compare/truncating-divide-by-power-of-two on
  * non-negative operands, which the two engines define identically.
  *
  * Algorithm (26 fraction bits): for n ≥ 1,
  *   e  = floor(log2 n) = length(bin(n)) − 1
  *   m  = n scaled into [2^26, 2^27)   (fixed-point mantissa, scale 2^26)
  *   26 squaring steps: m ← m² / 2^26; if m ≥ 2^27 the next fractional
  *   bit of log2(n) is 1 and m halves, else 0 — the classic shift-and-
  *   square binary logarithm
  *   ln(n)·1e9 ≈ ((e·2^26 + frac) · 693147181) div 2^26,
  *   693147181 = round(ln2 · 1e9).
  *
  * Error budget: mantissa truncation ≤ 2^-26 per step decays 2^-k into
  * log2, so |log2 error| ≤ ~2·2^-26 → ≲ 25 ppb per call — a DETERMINISTIC
  * shared approximation (identical in both engines), not a per-engine
  * libm rounding. Overflow headroom: m < 2^27 ⇒ m² < 2^54;
  * (e·2^26 + frac)·693147181 < 2^62 for every BIGINT n (e ≤ 62).
  */
object FixedLog {
  val FracBits = 26
  val Scale: Long = 1L << FracBits // 67108864
  val Top: Long = 1L << (FracBits + 1) // 134217728
  val Ln2Ppb = 693147181L // round(ln 2 · 1e9)

  /** The two dialect differences: truncating integer division and
    * 2^x as a BIGINT. Everything else is common SQL. */
  final case class Dialect(div: (String, String) => String,
                           shl: String => String)
  val spark: Dialect = Dialect(
    (a, b) => s"($a) div ($b)",
    e => s"shiftleft(CAST(1 AS BIGINT), $e)")
  val duckdb: Dialect = Dialect(
    (a, b) => s"($a) // ($b)",
    e => s"(CAST(1 AS BIGINT) << ($e))")

  /** e = floor(log2 n) for n ≥ 1 — identical text in both dialects. */
  def eExpr(n: String): String = s"length(bin($n)) - 1"

  /** initial mantissa: n scaled into [2^26, 2^27). */
  def mInitExpr(d: Dialect, n: String): String =
    s"CASE WHEN e >= $FracBits THEN " +
      d.div(n, d.shl(s"e - $FracBits")) +
      s" ELSE ($n) * ${d.shl(s"$FracBits - e")} END"

  private def m2(d: Dialect): String = d.div("m * m", Scale.toString)

  /** one squaring step: (m, fr) → (m', fr') — evaluated SIMULTANEOUSLY
    * off the previous step's columns (selectExpr / one CTE per step). */
  def mStepExpr(d: Dialect): String =
    s"CASE WHEN ${m2(d)} >= $Top THEN ${d.div(s"(${m2(d)})", "2")} " +
      s"ELSE ${m2(d)} END"
  def frStepExpr(d: Dialect): String =
    s"fr * 2 + (CASE WHEN ${m2(d)} >= $Top THEN 1 ELSE 0 END)"

  /** final fold: (e, fr) → ln(n)·1e9 as BIGINT. */
  def lnPpbExpr(d: Dialect): String =
    d.div(s"(e * $Scale + fr) * $Ln2Ppb", Scale.toString)

  /** Chained-CTE SQL (DuckDB twin shape): relation `src` with columns
    * (keep..., n BIGINT ≥ 1) → final CTE `fxlout`(keep..., lnppb).
    * Returns the CTE list BODY — splice after a leading `WITH ... ,`. */
  def ctes(d: Dialect, src: String, keep: Seq[String]): String = {
    val k = keep.mkString(", ")
    val sb = new StringBuilder
    sb ++= s"""fxle AS (
      SELECT $k, CAST(${eExpr("n")} AS BIGINT) AS e, n FROM $src
    ), fxl0 AS (
      SELECT $k, e, ${mInitExpr(d, "n")} AS m, CAST(0 AS BIGINT) AS fr
      FROM fxle
    )"""
    for (i <- 1 to FracBits) {
      sb ++= s""", fxl$i AS (
      SELECT $k, e, ${mStepExpr(d)} AS m, ${frStepExpr(d)} AS fr
      FROM fxl${i - 1}
    )"""
    }
    sb ++= s""", fxlout AS (
      SELECT $k, ${lnPpbExpr(d)} AS lnppb FROM fxl$FracBits
    )"""
    sb.toString
  }
}
