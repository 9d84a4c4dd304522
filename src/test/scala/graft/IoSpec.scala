package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink matrix (SURVEY.md §2 "Scans / sources / sinks"): CSV with
  * schema/nullValue/dateFormat, JSON incl. multiline, parquet roundtrip
  * with schema enforcement. (JDBC is code-complete in etl.Writers; no
  * database exists in this environment to drive it.) */
class IoSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("csv scan honors schema, nullValue and dateFormat") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("data.csv"),
      "id,amount,day\n1,10.5,2025/11/03\n2,NA,2025/11/04\n3,7.25,NA\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("amount", DoubleType),
      StructField("day", DateType)))
    val df = spark.read
      .option("header", "true").option("nullValue", "NA")
      .option("dateFormat", "yyyy/MM/dd")
      .schema(schema).csv(dir.toString)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(1).isNullAt(1), "NA must map to NULL")
    assert(rows(2).isNullAt(2))
    assert(rows(0).getDate(2).toString == "2025-11-03")
  }

  test("csv and json sinks round-trip typed rows") {
    val src = spark.range(100).selectExpr(
      "id", "CAST(id AS DOUBLE) / 3.0 AS v",
      "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('s', id) END AS s")
    val csvDir = Files.createTempDirectory("graft-csv-out").toString + "/d"
    src.write.option("header", "true").csv(csvDir)
    val csvBack = spark.read.option("header", "true")
      .schema(src.schema).csv(csvDir)
    assert(csvBack.count() == 100)
    // tolerance: both sums merge per-partition partials in nondeterministic
    // order, so the FP results can differ in the last ulps
    assert(math.abs(csvBack.agg(sum("v")).collect()(0).getDouble(0) -
      src.agg(sum("v")).collect()(0).getDouble(0)) < 1e-9)
    assert(csvBack.filter(col("s").isNull).count() == 10)
    val jsonDir = Files.createTempDirectory("graft-json-out").toString + "/d"
    src.write.json(jsonDir)
    val jsonBack = spark.read.schema(src.schema).json(jsonDir)
    assert(jsonBack.count() == 100)
    assert(jsonBack.select("id", "s").collect().map(r =>
      (r.getLong(0), Option(r.getString(1)))).toSet ==
      src.select("id", "s").collect().map(r =>
        (r.getLong(0), Option(r.getString(1)))).toSet)
  }

  test("json scan: PERMISSIVE captures corrupt records, DROPMALFORMED skips") {
    val dir = Files.createTempDirectory("graft-json-bad")
    Files.writeString(dir.resolve("c.json"),
      """{"id": 1, "v": 10.0}
        |{"id": 2 "v": BROKEN
        |{"id": 3, "v": 30.0}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (the default): bad line lands in _corrupt_record with
    // nulls elsewhere — no rows silently lost, quarantine-able downstream
    val perm = spark.read.schema(schema).json(dir.toString).cache()
    assert(perm.count() == 3)
    assert(perm.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(perm.filter(col("id").isNotNull).count() == 2)
    perm.unpersist()
    // DROPMALFORMED: bad line dropped entirely
    val dropped = spark.read.option("mode", "DROPMALFORMED")
      .schema(StructType(schema.fields.take(2))).json(dir.toString)
    assert(dropped.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("json scan: line-delimited and multiline") {
    val dir = Files.createTempDirectory("graft-json")
    Files.writeString(dir.resolve("a.json"),
      """{"k": 1, "s": "x"}
        |{"k": 2, "s": "y", "extra": true}
        |""".stripMargin)
    val df = spark.read.json(dir.toString)
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("k", "s", "extra"))

    val mdir = Files.createTempDirectory("graft-json-m")
    Files.writeString(mdir.resolve("b.json"),
      """[
        |  {"k": 1},
        |  {"k": 2}
        |]""".stripMargin)
    val mdf = spark.read.option("multiLine", "true").json(mdir.toString)
    assert(mdf.count() == 2)
  }

  test("orc roundtrip preserves schema and values; predicate reaches the scan") {
    // ORC is Spark's second first-class columnar format (bundled
    // orc-core): same writer/reader contract as parquet, including
    // format-level predicate pushdown — pinned here so the engine's
    // source matrix isn't parquet-monoculture by accident.
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    val src = spark.range(1000).selectExpr(
      "id", "CAST(id AS DOUBLE) * 1.5 AS v",
      "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('s', id) END AS s")
    src.write.orc(dir)
    val back = spark.read.orc(dir)
    // file formats read back with relaxed nullability — compare name/type
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 1000)
    assert(back.filter(col("s").isNull).count() == 143)
    val filtered = back.filter(col("id") < 100)
    assert(filtered.count() == 100)
    // the pushed predicate must appear in the ORC scan node
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), LessThan(id,100)]") ||
      plan.contains("LessThan(id,100)"),
      s"id predicate did not reach the ORC scan:\n$plan")
  }

  test("parquet roundtrip preserves schema and values") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pq").toString + "/t"
    val src = Seq((1L, Some(2.5), "a"), (2L, None, null))
      .toDF("id", "v", "s")
    src.write.parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet reads everything back nullable — compare names+types only
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq == src.orderBy("id").collect().toSeq)
  }

  test("schema-enforced read rejects nothing silently: corrupt column stays null") {
    val dir = Files.createTempDirectory("graft-badcsv")
    Files.writeString(dir.resolve("d.csv"), "id,n\n1,notanumber\n2,5\n")
    val df = spark.read.option("header", "true")
      .schema("id INT, n INT").csv(dir.toString)
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(1).getInt(1) == 5)
  }

  test("corrupt parquet file: loud by default, skipped under ignoreCorruptFiles") {
    // at 100 TB some file WILL arrive truncated; the default must fail the
    // job (silent data loss is worse), and the recovery lever must read
    // everything else
    val dir = Files.createTempDirectory("graft-corrupt").toString + "/data"
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(dir)
    Files.write(java.nio.file.Paths.get(dir, "part-corrupt.parquet"),
      "this is not a parquet file".getBytes)
    val boom = intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
    assert(boom.getMessage != null)
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try assert(spark.read.parquet(dir).count() == 10)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("xml source: rowTag scan with schema + attribute mapping, sink roundtrip") {
    // Spark 4 ships the XML datasource in spark-sql (the spark-xml
    // donation) — covering it closes the last text-format gap (fn_xml
    // covers the from_xml/xpath EXPRESSION surface; this is the SOURCE)
    val dir = Files.createTempDirectory("graft-xml")
    Files.writeString(dir.resolve("data.xml"),
      """<rows>
        |  <row id="1"><name>aa</name><qty>10</qty></row>
        |  <row id="2"><name>bb</name><qty>20</qty></row>
        |  <row id="3"><name>cc</name></row>
        |</rows>""".stripMargin)
    val df = spark.read.option("rowTag", "row").xml(dir.toString)
    // attributes surface as _-prefixed columns; missing element → null
    val rows = df.select(col("_id"), col("name"), col("qty"))
      .orderBy("_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(2).isNullAt(2), "absent <qty> must read as NULL")
    val out = Files.createTempDirectory("graft-xml-out").toString + "/x"
    df.selectExpr("_id AS id", "name", "qty")
      .write.option("rowTag", "r").option("rootTag", "rs").xml(out)
    val back = spark.read.option("rowTag", "r").xml(out)
    assert(back.count() == 3)
    assert(back.where(col("qty").isNull).count() == 1)
  }

  test("text source: one row per line, wholetext preserves the document") {
    val dir = Files.createTempDirectory("graft-txt")
    Files.writeString(dir.resolve("doc.txt"), "alpha\nbeta\ngamma\n")
    val lines = spark.read.text(dir.toString)
    assert(lines.count() == 3)
    assert(lines.agg(sum(length(col("value")))).head.getLong(0) == 14)
    val whole = spark.read.option("wholetext", "true").text(dir.toString)
    assert(whole.count() == 1)
    assert(whole.head.getString(0).startsWith("alpha\nbeta"))
  }
}
