package graft

import java.util.Properties
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables.t
import graft.etl.Writers

/** JDBC source/sink parity (SURVEY §2 A10 / "JDBC scan/sink") driven
  * against embedded Derby (ships with Spark) — append, truncate-overwrite,
  * read-back, and predicate pushdown into the database. */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private val url = s"jdbc:derby:${java.nio.file.Files.createTempDirectory("graft-derby")}/db;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("append sink + scan roundtrip preserves rows and types") {
    val src = t(spark, sf, "orders")
      .filter(col("o_orderkey") <= 100)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    Writers.appendJdbc(src, url, "orders_jdbc", props)
    val back = spark.read.jdbc(url, "orders_jdbc", props)
    assert(back.count() == src.count())
    val a = src.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getString(1) == y.getString(1))
      assert(math.abs(x.getDouble(2) - y.getDouble(2)) < 1e-9)
    }
  }

  test("truncate-overwrite replaces content, keeps the table") {
    val first = t(spark, sf, "nation")
    Writers.appendJdbc(first, url, "nation_jdbc", props)
    val replacement = first.filter(col("n_regionkey") === 0)
    Writers.overwriteJdbcTruncate(replacement, url, "nation_jdbc", props)
    assert(spark.read.jdbc(url, "nation_jdbc", props).count()
      == replacement.count())
  }

  test("filter pushes into the JDBC scan") {
    val scan = spark.read.jdbc(url, "orders_jdbc", props)
      .filter(col("o_totalprice") > 100000.0)
    // JDBCScan advertises pushed predicates in the explain output
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"),
      s"expected pushed JDBC predicate in:\n$plan")
    assert(scan.count() ==
      t(spark, sf, "orders").filter(col("o_orderkey") <= 100)
        .filter(col("o_totalprice") > 100000.0).count())
  }
}
