package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side collect with an EXPLICIT domain bound (VERDICT r9 #2).
  *
  * The graph/markov family iterates tiny fixpoints on the driver when the
  * state is bounded by a VALUE DOMAIN (the 25-nation key space, the
  * |event types|² transition matrix) rather than by data volume — the
  * documented `graph_components` pattern: the one data-sized job is the
  * cached edge/transition aggregate; everything collected is O(domain²).
  * That contract was previously implicit. This helper makes it a runtime
  * invariant: the collect pulls AT MOST `limit + 1` rows (a `limit(n)`
  * plan, never an unbounded action) and refuses to proceed if the bound
  * is violated — so pointing one of these operators at an unbounded
  * derived graph fails loudly instead of silently moving |V|·|E| work
  * onto the driver. Distributed superstep forms of the same algorithms
  * (pagerank, label_prop, kcore, betweenness) are the unbounded path.
  */
object Bounded {
  def collect(df: DataFrame, limit: Int, what: String): Array[Row] = {
    val rows = df.limit(limit + 1).collect()
    require(rows.length <= limit,
      s"$what: driver-iteration domain bound exceeded (> $limit rows) — " +
        "the value-domain contract no longer holds; use the distributed " +
        "superstep form (the graph_pagerank / label_prop pattern)")
    rows
  }
}
