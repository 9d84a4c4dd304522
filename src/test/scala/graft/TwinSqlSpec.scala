package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TwinSql

/** Contracts for the oracle-twin MATERIALIZED rewrite (r11): DuckDB
  * inlines CTEs by default, so every twin in SparkEntry.oracleSql goes
  * through TwinSql.materialize before the driver sees it. These tests pin
  * the rewrite mechanics; cross-engine value parity of the rewritten SQL
  * is checked end-to-end by tools/oracle_check.py. */
class TwinSqlSpec extends AnyFunSuite {

  test("plain chained CTEs get MATERIALIZED") {
    val sql = "WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a) " +
      "SELECT * FROM b JOIN a USING (x)"
    val out = TwinSql.materialize(sql)
    assert(out ==
      "WITH a AS MATERIALIZED (SELECT 1 AS x), " +
      "b AS MATERIALIZED (SELECT x FROM a) " +
      "SELECT * FROM b JOIN a USING (x)")
  }

  test("WINDOW clause in the main query is untouched") {
    val sql = "WITH a AS (SELECT 1 AS x) " +
      "SELECT sum(x) OVER w FROM a WINDOW w AS (ORDER BY x)"
    val out = TwinSql.materialize(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT 1"))
    assert(out.contains("WINDOW w AS (ORDER BY x)"))
  }

  test("recursive member skipped, sibling CTEs still materialized") {
    val sql = "WITH RECURSIVE base AS (SELECT 1 AS x), " +
      "reach(node, r) AS (SELECT x, x FROM base UNION " +
      "SELECT node + 1, r FROM reach WHERE node < 5) " +
      "SELECT * FROM reach"
    val out = TwinSql.materialize(sql)
    assert(out.contains("base AS MATERIALIZED ("))
    assert(out.contains("reach(node, r) AS (SELECT"))
    assert(!out.contains("reach(node, r) AS MATERIALIZED"))
  }

  test("column-list CTE without self-reference is materialized") {
    val sql = "WITH t(a, b) AS (SELECT 1, 2) SELECT * FROM t"
    assert(TwinSql.materialize(sql).contains("t(a, b) AS MATERIALIZED ("))
  }

  test("parens inside strings and comments do not confuse depth") {
    val sql = "WITH a AS (SELECT '((' AS s -- comment ) ( here\n" +
      ", 1 AS x) SELECT * FROM a"
    val out = TwinSql.materialize(sql)
    assert(out.startsWith("WITH a AS MATERIALIZED ("))
    assert(out.count(_ == 'M') >= 1)
  }

  test("already-materialized SQL is unchanged (idempotent)") {
    val once = TwinSql.materialize(
      "WITH a AS (SELECT 1 AS x) SELECT * FROM a")
    assert(TwinSql.materialize(once) == once)
  }

  test("no WITH clause → unchanged") {
    val sql = "SELECT l_returnflag AS f FROM lineitem GROUP BY 1"
    assert(TwinSql.materialize(sql) == sql)
  }

  test("every board twin rewrites structurally soundly") {
    SparkEntry.rawOracleSql.foreach { case (name, raw) =>
      val out = TwinSql.materialize(raw)
      // insertion-only rewrite: stripping the keyword restores the input
      assert(out.replace(" MATERIALIZED", "") ==
             raw.replace(" MATERIALIZED", ""),
        s"$name: rewrite must only insert MATERIALIZED tokens")
      // never inside a string literal: quote parity is preserved around
      // every insertion point (apostrophes inside -- comments don't
      // count, so strip comment tails line-by-line first)
      val noComments = out.linesIterator.map { l =>
        // a -- that sits inside a string literal stays (odd quote count
        // before it means the dashes are quoted content)
        val cut = l.indexOf("--")
        if (cut >= 0 && l.substring(0, cut).count(_ == '\'') % 2 == 0)
          l.substring(0, cut)
        else l
      }.mkString("\n")
      var idx = noComments.indexOf(" MATERIALIZED")
      while (idx >= 0) {
        val quotesBefore = noComments.substring(0, idx).count(_ == '\'')
        assert(quotesBefore % 2 == 0,
          s"$name: MATERIALIZED inserted inside a string literal")
        idx = noComments.indexOf(" MATERIALIZED", idx + 1)
      }
    }
  }

  test("recursive-member body scan survives quoted parens and comments") {
    // a quoted ')' before the self-reference must not truncate the body
    // (which would wrongly materialize a recursive member → DuckDB error)
    val early = "WITH RECURSIVE r(k, s) AS (SELECT 1, ')' " +
      "UNION ALL SELECT k + 1, s FROM r WHERE k < 3) SELECT * FROM r"
    assert(TwinSql.materialize(early) == early,
      "quoted ')' truncated the recursive body scan")
    // a quoted '(' must not make the body overrun into later SQL where a
    // downstream reference falsely marks a plain CTE recursive
    val overrun = "WITH t(a) AS (SELECT '(' ), u AS (SELECT a FROM t) " +
      "SELECT * FROM u JOIN t USING (a)"
    val out = TwinSql.materialize(overrun)
    assert(out.contains("t(a) AS MATERIALIZED ("),
      "quoted '(' overran the body scan and skipped materialization")
    // an apostrophe inside a -- comment must not derail the scan either
    val commented = "WITH RECURSIVE r(k) AS (SELECT 1 -- it's a seed )\n" +
      "UNION ALL SELECT k + 1 FROM r WHERE k < 3) SELECT * FROM r"
    assert(TwinSql.materialize(commented) == commented)
  }

  test("block comments and double-quoted identifiers can't corrupt depth") {
    // r12 (ADVICE): a paren inside a /* */ comment or a "quoted ident"
    // previously corrupted depth-0 tracking — now both are skipped
    val blk = "WITH a AS (SELECT 1 AS x) /* stray ( paren */ " +
      "SELECT * FROM a"
    val outBlk = TwinSql.materialize(blk)
    assert(outBlk.contains("a AS MATERIALIZED ("))
    assert(outBlk.contains("/* stray ( paren */"))
    val dq = "WITH \"w(eird\" AS (SELECT 1 AS x), b AS (SELECT x FROM " +
      "\"w(eird\") SELECT * FROM b"
    val outDq = TwinSql.materialize(dq)
    // the quoted name's paren must not break depth: b still materializes
    assert(outDq.contains("b AS MATERIALIZED ("))
    // a block comment INSIDE a CTE body must not derail the body scan
    val inBody = "WITH a AS (SELECT 1 /* ) sneaky */ AS x) SELECT * FROM a"
    assert(TwinSql.materialize(inBody).contains("a AS MATERIALIZED ("))
  }

  test("WITH RECURSIVE member without a column list is still skipped") {
    // r12 (ADVICE): the bare-name recursive form got MATERIALIZED before,
    // which DuckDB rejects on recursive anchors
    val sql = "WITH RECURSIVE r AS (SELECT 1 AS k " +
      "UNION ALL SELECT k + 1 FROM r WHERE k < 3), " +
      "plain AS (SELECT 2 AS y) " +
      "SELECT * FROM r JOIN plain ON r.k = plain.y"
    val out = TwinSql.materialize(sql)
    assert(out.contains("r AS (SELECT 1"), "recursive anchor materialized")
    assert(!out.contains("r AS MATERIALIZED"))
    assert(out.contains("plain AS MATERIALIZED ("))
  }

  test("the two r10 killer twins are actually rewritten") {
    val k = TwinSql.materialize(SparkEntry.rawOracleSql("graph_ktruss"))
    assert(k.contains("AS MATERIALIZED ("))
    val d = TwinSql.materialize(SparkEntry.rawOracleSql("llm_dedup_apply"))
    assert(d.contains("AS MATERIALIZED ("))
    // and the recursive reach member is preserved un-materialized
    assert(d.contains("reach(node, r) AS ("))
  }
}
