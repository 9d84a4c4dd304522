package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables.t
import graft.ops.Partitioning

/** Business-analytics extension queries (SURVEY.md §2 tier-C): concentration
  * and distribution analyses (Pareto/ABC, Gini), a single-scan correlation
  * matrix, period-over-period growth, an order-independent table
  * fingerprint, and URL-canonicalization dedup.
  *
  * Numeric determinism: every query that feeds floating-point group sums
  * into further arithmetic first converts to EXACT integer cent units
  * (`round(x*100).cast(bigint)`) or rounds the group sum once — integer
  * sums are associative, so Spark's partial-aggregation order and DuckDB's
  * sequential order provably agree, and the derived doubles are then
  * bit-identical on both engines (same literal expression order).
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  /** Exact revenue in 1/10000-dollar units: price cents × (100 − disc%),
    * both factors exact integers recovered from the 2-decimal doubles. */
  private def revU(price: Column, disc: Column): Column =
    round(price * 100).cast("bigint") * (lit(100) - round(disc * 100).cast("bigint"))

  val defs: Map[String, Q] = Map(

    // Pareto / ABC classification: parts ranked by revenue, cumulative
    // share of total, bucketed A (≤70%), B (≤90%), C. The cumulative sum
    // runs through ops.Partitioning.rankedCumSum — the two-level
    // distributed prefix sum — NOT a partition-less global window, so the
    // ranking phase stays parallel at any entity cardinality (the fact-scan
    // aggregation above it is an ordinary keyed shuffle). The total is the
    // scalar-broadcast pattern: a 1-row global aggregate cross-joined in.
    "agg_pareto_abc" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val rev = li.groupBy(col("l_partkey").as("partkey"))
        .agg(sum(revU(col("l_extendedprice"), col("l_discount"))).as("rev_u"))
      val tot = rev.agg(sum(col("rev_u")).as("tot_u"))
      val cum = Partitioning.rankedCumSum(
        rev, col("rev_u"), Seq(col("rev_u").desc, col("partkey")), 32, "cum_u")
      val share = col("cum_u").cast("double") / col("tot_u")
      cum.crossJoin(broadcast(tot))
        .select(
          col("partkey"),
          (col("rev_u") / lit(10000.0)).as("revenue"),
          share.as("cum_share"),
          when(share <= 0.7, "A").when(share <= 0.9, "B").otherwise("C").as("abc"))
    }),

    // Gini coefficient of customer revenue concentration per nation:
    // G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n over ascending-sorted x. The rank
    // window partitions by nation (parallel); all sums are exact integer
    // cents, so the final double division is engine-identical.
    "agg_gini" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val crev = c.join(o, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"), col("c_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("rev_c"))
      val w = Window.partitionBy(col("nationkey"))
        .orderBy(col("rev_c"), col("c_custkey"))
      crev.withColumn("i", row_number().over(w).cast("bigint"))
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("rev_c")).as("tot_c"),
          sum(col("i") * col("rev_c")).as("irev_c"))
        .select(col("nationkey"), col("n_cust"),
          round(lit(2.0) * col("irev_c") / (col("n_cust") * col("tot_c"))
            - (col("n_cust") + lit(1.0)) / col("n_cust"), 6).as("gini"))
    }),

    // Pairwise Pearson correlation matrix of the lineitem measures — six
    // pairs in ONE scan, one partial-aggregation pass (corr is a
    // single-pass moment aggregate; no per-pair rescan).
    "agg_corr_matrix" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def c2(a: String, b: String): Column = round(corr(col(a), col(b)), 5)
      li.agg(
        c2("l_quantity", "l_extendedprice").as("c_qty_price"),
        c2("l_quantity", "l_discount").as("c_qty_disc"),
        c2("l_quantity", "l_tax").as("c_qty_tax"),
        c2("l_extendedprice", "l_discount").as("c_price_disc"),
        c2("l_extendedprice", "l_tax").as("c_price_tax"),
        c2("l_discount", "l_tax").as("c_disc_tax"))
    }),

    // Month-over-month revenue growth: the lag window runs over the
    // month-level aggregate (|months| rows — bounded, not data-sized), so
    // the single-partition window is scale-safe by construction.
    "win_mom_growth" -> ((s, d) => {
      val o = t(s, d, "orders")
      val m = o.groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      val prev = lag(col("rev"), 1).over(Window.orderBy(col("month")))
      m.select(col("month"), col("rev"),
        round((col("rev") - prev) / prev * 100, 4).as("mom_pct"))
    }),

    // Order-independent table fingerprint: per-row md5 over a canonical
    // '|'-joined rendering, folded with bit_xor (commutative + exact →
    // partition order irrelevant). The standard cross-system data-validation
    // primitive: at 100 TB both sides compute one narrow scan + one
    // 1-row-per-table aggregate, and equal fingerprints certify equal
    // content without moving rows.
    "etl_table_fingerprint" -> ((s, d) => {
      def fp(df: DataFrame, name: String, cols: Seq[Column]): DataFrame =
        df.select(
            conv(substring(md5(concat_ws("|", cols: _*)), 1, 15), 16, 10)
              .cast("bigint").as("h64"))
          .agg(count(lit(1)).as("n_rows"), bit_xor(col("h64")).as("fp"))
          .select(lit(name).as("table_name"), col("n_rows"), col("fp"))
      val cust = fp(t(s, d, "customer"), "customer", Seq(
        col("c_custkey").cast("string"), col("c_name"),
        col("c_nationkey").cast("string"), col("c_mktsegment")))
      val ord = fp(t(s, d, "orders"), "orders", Seq(
        col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
        col("o_orderstatus"), col("o_orderpriority"),
        col("o_orderdate").cast("date").cast("string")))
      cust.unionAll(ord)
    }),

    // URL-canonicalization dedup — the web-crawl curation op: normalize
    // scheme/host case, strip tracking (utm_*) params, drop fragments and
    // trailing slashes, then group by the canonical form. URLs are built
    // deterministically from documents (id collisions on doc_id % 500
    // guarantee real duplicate groups); Spark canonicalizes via parse_url
    // component extraction, the oracle twin via RFC-3986 regexes — so the
    // hash check pins the parser exactly like fn_url does.
    "llm_url_dedup" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val url = concat(
        lit("https://"),
        when(col("doc_id") % 2 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".example.org/d/"), (col("doc_id") % 500).cast("string"),
        when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
        lit("?id="), (col("doc_id") % 500).cast("string"),
        when(col("doc_id") % 3 === 0, lit("&utm_source=feed&utm_campaign=x"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("#frag")).otherwise(lit("")))
      val withUrl = doc.withColumn("url", url)
      val host = lower(expr("parse_url(url, 'HOST')"))
      val path = regexp_replace(expr("parse_url(url, 'PATH')"), "/$", "")
      val query = regexp_replace(
        regexp_replace(expr("parse_url(url, 'QUERY')"), "(&|^)utm_[^&]*", ""),
        "^&", "")
      val canon = concat(lit("https://"), host, path,
        when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
      withUrl.withColumn("canon_url", canon)
        .groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_doc_id"))
    }))

  val sql: Map[String, String] = Map(

    "agg_pareto_abc" -> """
      WITH rev AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev_u
        FROM lineitem GROUP BY 1),
      ranked AS (
        SELECT partkey, rev_u,
               SUM(rev_u) OVER (ORDER BY rev_u DESC, partkey
                                ROWS UNBOUNDED PRECEDING) AS cum_u,
               SUM(rev_u) OVER () AS tot_u
        FROM rev)
      SELECT partkey,
             rev_u/10000.0 AS revenue,
             CAST(cum_u AS DOUBLE)/tot_u AS cum_share,
             CASE WHEN CAST(cum_u AS DOUBLE)/tot_u <= 0.7 THEN 'A'
                  WHEN CAST(cum_u AS DOUBLE)/tot_u <= 0.9 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked""",

    "agg_gini" -> """
      WITH crev AS (
        SELECT c_nationkey AS nationkey, c_custkey,
               SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS rev_c
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY 1, 2),
      idx AS (
        SELECT nationkey, rev_c,
               ROW_NUMBER() OVER (PARTITION BY nationkey
                                  ORDER BY rev_c, c_custkey) AS i
        FROM crev)
      SELECT nationkey,
             COUNT(*) AS n_cust,
             ROUND(2.0*SUM(i*rev_c)/(COUNT(*)*SUM(rev_c))
                   - (COUNT(*)+1.0)/COUNT(*), 6) AS gini
      FROM idx GROUP BY 1""",

    "agg_corr_matrix" -> """
      SELECT ROUND(corr(l_quantity, l_extendedprice), 5) AS c_qty_price,
             ROUND(corr(l_quantity, l_discount), 5)      AS c_qty_disc,
             ROUND(corr(l_quantity, l_tax), 5)           AS c_qty_tax,
             ROUND(corr(l_extendedprice, l_discount), 5) AS c_price_disc,
             ROUND(corr(l_extendedprice, l_tax), 5)      AS c_price_tax,
             ROUND(corr(l_discount, l_tax), 5)           AS c_disc_tax
      FROM lineitem""",

    "win_mom_growth" -> """
      WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               ROUND(SUM(o_totalprice), 2) AS rev
        FROM orders GROUP BY 1)
      SELECT month, rev,
             ROUND((rev - LAG(rev) OVER (ORDER BY month))
                   / LAG(rev) OVER (ORDER BY month) * 100, 4) AS mom_pct
      FROM m""",

    "etl_table_fingerprint" -> """
      SELECT 'customer' AS table_name,
             COUNT(*) AS n_rows,
             bit_xor(CAST('0x' || substring(md5(concat_ws('|',
               CAST(c_custkey AS VARCHAR), c_name,
               CAST(c_nationkey AS VARCHAR), c_mktsegment)), 1, 15) AS BIGINT)) AS fp
      FROM customer
      UNION ALL
      SELECT 'orders' AS table_name,
             COUNT(*) AS n_rows,
             bit_xor(CAST('0x' || substring(md5(concat_ws('|',
               CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
               o_orderstatus, o_orderpriority,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR))), 1, 15) AS BIGINT)) AS fp
      FROM orders""",

    "llm_url_dedup" -> """
      WITH u AS (
        SELECT doc_id,
               'https://'
               || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
               || '.example.org/d/' || CAST(doc_id % 500 AS VARCHAR)
               || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
               || '?id=' || CAST(doc_id % 500 AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0
                       THEN '&utm_source=feed&utm_campaign=x' ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
        FROM documents),
      parts AS (
        SELECT doc_id,
               lower(regexp_extract(url, '^https://([^/?#]+)', 1)) AS host,
               regexp_replace(
                 regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1),
                 '/$', '') AS path,
               regexp_replace(regexp_replace(
                 regexp_extract(url, '\?([^#]*)', 1),
                 '(&|^)utm_[^&]*', '', 'g'), '^&', '') AS query
        FROM u)
      SELECT 'https://' || host || path
             || CASE WHEN length(query) > 0 THEN '?' || query ELSE '' END
               AS canon_url,
             COUNT(*) AS n_dups,
             MIN(doc_id) AS keep_doc_id
      FROM parts GROUP BY 1""")
}
