package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural invariants of the graph-analytics queries (queries.Graph)
  * on the sf0.001 fixture — the value-level check is the DuckDB oracle;
  * here we pin the graph-theoretic claims the scaladoc makes.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pagerank: no dangling mass on the fixture — ranks sum to 1") {
    // the scaladoc claims every nation has out-edges (so the dropped
    // dangling term is vacuous); if that holds, total rank mass is exactly
    // the teleport + damping budget = 1.
    val pr = SparkEntry.queries("graph_pagerank")(spark, sf)
    val total = pr.agg(sum("pagerank")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass $total leaked — a " +
      "nation without out-edges appeared; dangling handling now matters")
    // ranks are a proper distribution: all positive
    assert(pr.filter(col("pagerank") <= 0).count() == 0)
  }

  test("reachability: source at hop 0, hops strictly increase by frontier") {
    val r = SparkEntry.queries("graph_reachability")(spark, sf)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    // nation 0 = ALGERIA in TPC-H nomenclature; hop 0 is the source itself
    assert(r.values.min == 0)
    assert(r.count(_._2 == 0) == 1)
    // bounded at 4 hops by construction
    assert(r.values.max <= 4)
  }

  test("shortest path: source at cost 0, costs positive and hop-consistent") {
    val r = SparkEntry.queries("graph_shortest_path")(spark, sf)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // exactly one node (the source) at cost 0; all others strictly positive
    assert(r.values.count(_ == 0.0) == 1)
    assert(r.values.forall(_ >= 0.0))
    // reachable set ⊆ BFS reachable set (same sparsified graph, same bound)
    val bfs = SparkEntry.queries("graph_reachability")(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(r.keySet == bfs, "cost-reachable set must equal hop-reachable set")
  }

  test("components: labels are the min key of each member set") {
    // the min-label fixpoint claim, checked against the node ids directly:
    // every node's label ≤ its own key, and each component's label is
    // EXACTLY the smallest key among its members (no stale labels survive).
    val nation = graft.core.Tables.t(spark, sf, "nation")
      .select(col("n_name"), col("n_nationkey").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val comp = SparkEntry.queries("graph_components")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(comp.length == nation.size, "every node must be labeled")
    comp.foreach { case (name, c) =>
      assert(c <= nation(name), s"$name labeled $c above its own key")
    }
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(members.map(m => nation(m._1)).min == label,
        s"component $label label is not its minimum member key")
    }
  }

  test("triangles: per-node participation sums to a multiple of 3") {
    // each triangle contributes exactly one count to each of its 3 corners
    val tri = SparkEntry.queries("graph_triangles")(spark, sf)
    val total = tri.agg(sum("n_triangles")).head.getLong(0)
    assert(total > 0 && total % 3 == 0, s"corner-count total $total")
  }
}
