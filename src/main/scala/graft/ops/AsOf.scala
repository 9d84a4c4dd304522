package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join (SURVEY §2 "as-of / interval join", §7.4 risk 7):
  * for every left row, attach the most recent right row with
  * `right.ts < left.ts` (strictly prior), matching on equi-keys.
  *
  * Composed as union → one sorted window pass per key — O(n log n) in the
  * shuffle sort, no range join, no per-row scan of the right side. This is
  * the scale-safe shape: cost = one hash shuffle of (left ∪ right) by key
  * + a linear window pass. A BroadcastNestedLoop range join would be
  * O(|L|·|R|) per key and is never generated here.
  *
  * Semantics match DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND
  * r.ts < l.ts` (oracle-checked via the `join_asof` query, which is this
  * operator specialized to events).
  */
object AsOf {

  /** @param left       probe side (each row gets the as-of match)
    * @param right      reference side
    * @param keys       equi-join key column names (present on both sides)
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param rightVals  right columns to carry (suffixed `_asof`) */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag and union, ordered by (ts, side) with left=0 < right=1: a right
    // row at ts == left.ts sorts AFTER the left row, so the frame
    // [unbounded, -1] sees only right rows with ts STRICTLY before —
    // exact `r.ts < l.ts` semantics.
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .select((keys.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(1))
      .select((keys.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(c).as(s"__v_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val matched = l.unionByName(r)
      .select(col("*") +:
        rightVals.map(c =>
          last(col(s"__v_$c"), ignoreNulls = true).over(w).as(s"${c}_asof")): _*)
      .filter(col("__side") === 0)
    matched.select(
      (keys ++ leftCols.filterNot(keys.contains)).map(col) ++
        rightVals.map(c => col(s"${c}_asof")): _*)
  }
}
