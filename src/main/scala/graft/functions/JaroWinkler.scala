package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity of two string
  * columns — the fuzzy-matching kernel of the entity-resolution family
  * (SURVEY.md §2 tier C "string family" / record linkage), pinned to the
  * standard definition DuckDB's `jaro_winkler_similarity` implements so the
  * driver oracle can hash-check it value-for-value:
  *
  *   - match window = max(|a|,|b|)/2 − 1 (integer floor, min 0);
  *   - jaro = (m/|a| + m/|b| + (m − ⌊t/2⌋)/m) / 3, t = mismatched
  *     positions (strcmp95's integer halving, which RapidFuzz keeps);
  *   - Winkler boost only when jaro > 0.7: jw = jaro + ℓ·0.1·(1 − jaro)
  *     with ℓ = common prefix length capped at 4;
  *   - any empty input (or zero matches) → 0.0, matching DuckDB (which
  *     returns 0 even for two empty strings).
  *
  * Why an Expression, not a UDF: in a record-linkage join this kernel runs
  * once per CANDIDATE PAIR — the output of blocking, which at the 100 TB
  * design point is still billions of rows. `doGenCode` keeps it inside
  * whole-stage codegen as a static primitive-array call (the same shape as
  * Spark's own `levenshtein`): no Row boxing, no Scala lambda dispatch, no
  * codegen fallback gap in the middle of the join stage. The O(|a|·|b|)
  * window scan is bounded by blocking (names/titles, not documents).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, " +
      s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and generated code.
    * Operates on Java chars (UTF-16 code units); for the BMP text this
    * engine processes that is exactly DuckDB's per-code-point comparison.
    */
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    // match window; max(...) guards the 1-char case where la/2-1 = -1
    val win = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - win)
      val hi = math.min(lb - 1, i + win)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b, in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // strcmp95 convention (which RapidFuzz/DuckDB follow): transpositions
    // = mismatched-position count / 2 with INTEGER division — an odd
    // mismatch count floors, it does not contribute a half transposition
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val lmax = math.min(4, math.min(la, lb))
      while (l < lmax && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}
