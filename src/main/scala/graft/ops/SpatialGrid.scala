package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked spatial radius self-join — the scale pattern for "all
  * point pairs within distance r" (geo dedup, catchment overlap, sensor
  * neighborhoods). Blocking: cell size = r, one side explodes to its 3×3
  * neighborhood, so a pair within r necessarily collides (per axis,
  * |Δx| ≤ r ⇒ the floor-r cells differ by at most 1) and collides on
  * exactly ONE (cx, cy) — complete recall, zero dedup. Candidates are
  * O(n·local density), shuffled on cell id; the naive form is the
  * quadratic theta join the plan audit forbids. `join_spatial_grid`'s
  * DuckDB oracle is that brute force, so driver hash parity proves
  * blocked ≡ exact on real data; SpatialSpec pins the boundary cases.
  */
object SpatialGrid {

  /** All unordered point pairs within `r` of each other. `pts` must carry
    * a unique orderable key `k` and INTEGER coordinates `xi`, `yi` (scale
    * them up front — integer coords make the distance predicate exact
    * bigint, no fp). Cells use floor division, so negative coordinates
    * block correctly. Returns (k1, k2, d2) with k1 < k2, d2 = Δx²+Δy² ≤ r².
    */
  def radiusSelfJoin(pts: DataFrame, r: Long): DataFrame = {
    require(r > 0, s"radius must be positive; got $r")
    // EXACT bigint floor division: c − pmod(c,r) is a nonnegative-remainder
    // multiple of r, so truncating `div` equals floor(c/r) for any sign.
    // The earlier floor(c / r.toDouble) routed through a double quotient,
    // which for |c| ≥ 2^53 can floor into the wrong cell and silently
    // drop qualifying pairs.
    def cell(name: String): Column = expr(s"($name - pmod($name, $r)) div $r")
    val aa = pts.select(col("k").as("k1"),
      col("xi").as("x1"), col("yi").as("y1"),
      cell("xi").as("cx"), cell("yi").as("cy"))
    val bb = pts
      .select(col("k").as("k2"), col("xi").as("x2"), col("yi").as("y2"),
        explode(array(cell("xi") - 1, cell("xi"),
          cell("xi") + 1)).as("cx"))
      .select(col("k2"), col("x2"), col("y2"), col("cx"),
        explode(array(cell("y2") - 1, cell("y2"),
          cell("y2") + 1)).as("cy"))
    val d2 = (col("x1") - col("x2")) * (col("x1") - col("x2")) +
      (col("y1") - col("y2")) * (col("y1") - col("y2"))
    aa.join(bb, Seq("cx", "cy"))
      .filter(col("k1") < col("k2") && d2 <= lit(r * r))
      .select(col("k1"), col("k2"), d2.as("d2"))
  }
}
