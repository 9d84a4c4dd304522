package graft.core

/** Rewrites DuckDB oracle-twin SQL so chained CTEs are evaluated once.
  *
  * DuckDB (the driver's oracle engine, v1.0) INLINES common table
  * expressions by default. A twin built as a chain of CTEs where each
  * round references the previous one more than once — the standard
  * unrolled-iteration twin pattern used throughout this repo — therefore
  * expands to an exponential plan: `graph_ktruss`'s 4 peel rounds, each
  * referencing the prior edge set three times (twice through the
  * symmetrized view + once in the filtering join), re-inline the 4-table
  * star join ~3⁴ times, which measured at 212 s of 32-core CPU at sf0.01
  * (r10 verdict) for a 75-edge graph. Forcing `AS MATERIALIZED` evaluates
  * every CTE exactly once: the same query drops to ~3 s, and the whole
  * 439-twin oracle sweep fits back inside the driver's t2 budget.
  *
  * The rewrite is purely a DuckDB *plan* hint — semantics are unchanged
  * (the only observable difference is floating-point summation order,
  * below the driver's 6-decimal rounding; verified for every twin in
  * TwinSqlSpec + tools/oracle_check.py).
  *
  * Mechanics: scan the statement tracking single-quoted strings, `--`
  * line comments and paren depth; at depth 0, every `name AS (` between
  * `WITH` and the main `SELECT` is a CTE definition and gets
  * `MATERIALIZED` inserted. The scan stops at the first depth-0 `SELECT`
  * so `WINDOW w AS (...)` clauses in the main query are never touched.
  * A CTE whose body references its own name is a recursive member and is
  * skipped — DuckDB cannot materialize the recursive anchor. The body
  * scan always runs for the column-list form (`reach(node, r) AS (`) and,
  * under a statement beginning `WITH RECURSIVE`, for bare-name members
  * too. The scan models single-quoted strings, double-quoted identifiers
  * (`"left"` in llm_bpe_train), `--` line comments and non-nesting block
  * comments, so none of those can corrupt depth tracking.
  */
object TwinSql {

  def materialize(sql: String): String = {
    val n = sql.length

    // depth-0 identifier tokens, in order: (start, end, text)
    val toks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var i = 0
    var depth = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        var j = i + 1
        var done = false
        while (j < n && !done) {
          if (sql.charAt(j) == '\'') {
            if (j + 1 < n && sql.charAt(j + 1) == '\'') j += 2 // escaped ''
            else done = true
          } else j += 1
        }
        i = j + 1
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val j = sql.indexOf('\n', i)
        i = if (j < 0) n else j + 1
      } else if (c == '"') {
        // double-quoted identifier ("left", "right"): skip to the closing
        // quote ("" escapes) so a paren inside it can't corrupt depth
        var j = i + 1
        var done = false
        while (j < n && !done) {
          if (sql.charAt(j) == '"') {
            if (j + 1 < n && sql.charAt(j + 1) == '"') j += 2
            else done = true
          } else j += 1
        }
        i = j + 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        // block comment: skip to the closing */ so its content can't
        // corrupt depth-0 tracking (non-nesting, per the SQL standard)
        val j = sql.indexOf("*/", i + 2)
        i = if (j < 0) n else j + 2
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && (c.isLetter || c == '_')) {
        var j = i
        while (j < n && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
        toks += ((i, j, sql.substring(i, j)))
        i = j
      } else i += 1
    }

    val skipWords =
      Set("WITH", "RECURSIVE", "AS", "SELECT", "FROM", "MATERIALIZED")
    // a recursive CTE may be written WITHOUT a column list — under
    // WITH RECURSIVE the self-reference body scan must run for every
    // member (DuckDB rejects MATERIALIZED on a recursive anchor)
    val withRecursive = toks.length >= 2 &&
      toks(0)._3.equalsIgnoreCase("WITH") &&
      toks(1)._3.equalsIgnoreCase("RECURSIVE")
    val inserts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var k = 0
    var mainSelect = false
    while (k < toks.length - 1 && !mainSelect) {
      val (_, e0, t0) = toks(k)
      val (s1, e1, t1) = toks(k + 1)
      if (t0.toUpperCase == "SELECT") mainSelect = true
      else if (t1.toUpperCase == "AS" && !skipWords.contains(t0.toUpperCase)) {
        // next non-space char after AS must open the CTE body
        var j = e1
        while (j < n && sql.charAt(j).isWhitespace) j += 1
        if (j < n && sql.charAt(j) == '(') {
          // column-list form (`name(cols) AS (`): recursive members
          // reference their own name in the body — skip those only. The
          // body scan uses the SAME string/comment-aware walk as the
          // outer tokenizer: a quoted ')' would otherwise truncate the
          // body early (missing the self-reference → invalid MATERIALIZED
          // on a recursive member) and a quoted '(' would overrun it
          // (false self-reference → materialization silently skipped).
          val selfRef =
            if (sql.substring(e0, s1).contains('(') || withRecursive) {
              var d = 0; var m = j; var end = -1
              while (m < n && end < 0) {
                val ch = sql.charAt(m)
                if (ch == '\'' || ch == '"') {
                  var q = m + 1
                  var done = false
                  while (q < n && !done) {
                    if (sql.charAt(q) == ch) {
                      if (q + 1 < n && sql.charAt(q + 1) == ch) q += 2
                      else done = true
                    } else q += 1
                  }
                  m = q
                } else if (ch == '-' && m + 1 < n && sql.charAt(m + 1) == '-') {
                  val nl = sql.indexOf('\n', m)
                  m = if (nl < 0) n - 1 else nl
                } else if (ch == '/' && m + 1 < n && sql.charAt(m + 1) == '*') {
                  val ce = sql.indexOf("*/", m + 2)
                  m = if (ce < 0) n - 1 else ce + 1
                } else if (ch == '(') d += 1
                else if (ch == ')') { d -= 1; if (d == 0) end = m }
                m += 1
              }
              val body = sql.substring(j, if (end < 0) n else end)
              ("""\b""" + java.util.regex.Pattern.quote(t0) + """\b""").r
                .findFirstIn(body).isDefined
            } else false
          if (!selfRef) inserts += e1
        }
      }
      k += 1
    }

    if (inserts.isEmpty) sql
    else {
      val sb = new StringBuilder
      var prev = 0
      inserts.foreach { pos =>
        sb.append(sql.substring(prev, pos)).append(" MATERIALIZED")
        prev = pos
      }
      sb.append(sql.substring(prev, n))
      sb.toString
    }
  }
}
