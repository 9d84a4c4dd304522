package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Contracts for the r12 wave: the Avro source/sink (built on the avro/
  * avro-mapred libs, no spark-avro artifact), the IVF-pooled MMR variant,
  * the exact-anchor hot-shingle pairing guard, and the lazy two-level
  * rank. Driver-side hash parity covers the board entries; these pin the
  * mechanics the oracle can't see. */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = TestSession.sf

  test("AvroIO roundtrips every bridged type including nulls") {
    val st = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("y", BinaryType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.25f, "hello", true, Array[Byte](1, 2, 3)),
      Row(null, null, null, null, null, null, null),
      Row(-9L, -8, Double.MinPositiveValue, -0.0f, "", false,
        Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), st)
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toString
    graft.etl.AvroIO.write(df, dir)
    val back = graft.etl.AvroIO.read(spark, dir, st)
    assert(back.schema == st)
    val got = back.collect().map(r =>
      (r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5),
        Option(r.get(6)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull))
    val want = rows.map(r =>
      (r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5),
        Option(r.get(6)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull))
    assert(got.toSet == want.toSet)
    // one container file per non-empty partition (the distributed sink)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty && files.length <= 2)
  }

  test("AvroIO rejects types outside the bridge loudly") {
    intercept[IllegalArgumentException] {
      graft.etl.AvroIO.avroSchema(StructType(Seq(
        StructField("t", TimestampType))))
    }
  }

  test("etl_avro_roundtrip reproduces the supplier table exactly") {
    val rt = SparkEntry.queries("etl_avro_roundtrip")(spark, sf).collect()
    val src = graft.core.Tables.t(spark, sf, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
      .orderBy(col("s_suppkey")).collect()
    assert(rt.toSeq == src.toSeq)
  }

  test("llm_mmr_rerank_ann picks from IVF-probed cells, 5 picks/query") {
    val ann = SparkEntry.queries("llm_mmr_rerank_ann")(spark, sf).collect()
    val perQ = ann.groupBy(_.getLong(0))
    assert(perQ.nonEmpty)
    perQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5),
        s"query $q: picks not 1..5")
      // the query itself is never selected
      assert(!rows.exists(_.getLong(2) == q))
    }
    // the recall contract row the oracle checks must hold here too
    val rec = SparkEntry.queries("llm_mmr_rerank_ann_recall")(spark, sf)
      .collect()
    assert(rec.length == 1 && rec(0).getBoolean(1),
      s"ANN-MMR recall below floor: ${rec.mkString}")
  }

  test("hot-shingle guard passes the fixture corpus and fails a hot one") {
    // board anchors stay green (fixture df << budget) — exercised by the
    // oracle; here: a synthetic corpus with one shingle in every doc must
    // abort once its df exceeds a small budget. Reuse the guard shape
    // directly on a crafted (doc_id, shingle) frame via the public API.
    import spark.implicits._
    val sh = (1 to 50).map(i => (i.toLong, "the same shingle"))
      .toDF("doc_id", "shingle")
    val guarded = sh
      .join(sh.groupBy($"shingle").agg(count(lit(1)).as("__df")), Seq("shingle"))
      .filter(expr(
        "isnull(assert_true(__df <= 10, 'hot shingle exceeds budget'))"))
    val e = intercept[Exception] { guarded.count() }
    assert(e.getMessage != null)
    // and the production anchors still plan + run at test SF
    assert(SparkEntry.queries("llm_ngram_jaccard")(spark, sf).count() >= 0)
  }

  test("rankedRowNumber(eager=false) numbers identically to eager") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ((i * 7919) % 1000, i))
      .toDF("k", "v")
    val a = graft.ops.Partitioning
      .rankedRowNumber(df, Seq($"k", $"v"), 8, "rn")
      .select($"k", $"v", $"rn").collect().sortBy(r => (r.getInt(0), r.getInt(1)))
    val b = graft.ops.Partitioning
      .rankedRowNumber(df, Seq($"k", $"v"), 8, "rn", eager = false)
      .select($"k", $"v", $"rn").collect().sortBy(r => (r.getInt(0), r.getInt(1)))
    assert(a.map(_.getLong(2)).toSeq == b.map(_.getLong(2)).toSeq)
    // contiguous 1..N
    assert(b.map(_.getLong(2)).sorted.toSeq == (1L to 1000L))
  }

  test("llm_js_divergence defines JSD = 0 on a single-source corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r12").toString
    Seq((1L, "alpha beta beta", "en", "only_source", 15L),
        (2L, "alpha gamma", "en", "only_source", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("llm_js_divergence")(spark, dir).collect()
    assert(out.length == 1)
    val jsd = out(0).getAs[Long]("jsd_ppb")
    assert(jsd == 0L, s"single-source JSD should be 0, got $jsd")
  }
}
