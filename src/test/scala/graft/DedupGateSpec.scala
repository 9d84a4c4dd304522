package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables.t
import graft.streaming.{DedupGate, EventStreams}

/** The streaming near-dup gate: stateless plan ⇒ the streamed result must
  * EQUAL the batch twin exactly (no watermark frontier to reason about),
  * and a planted near-copy must be caught with the Jaccard the exact
  * anchor assigns it. */
class DedupGateSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def docsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  test("streamed gate over file replay equals the batch twin exactly") {
    val docs = t(spark, sf, "documents")
    val index = DedupGate.corpusIndex(
      docs.filter(pmod(col("doc_id"), lit(10)) < 9)).localCheckpoint()

    val incomingDir =
      Files.createTempDirectory("graft-gate").toString + "/incoming"
    docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      .select("doc_id", "text").write.parquet(incomingDir)

    val stream = spark.readStream.schema(docsSchema).parquet(incomingDir)
    EventStreams.runToMemory(
      DedupGate.gate(stream, index, minJaccard = 0.2), "gate_out")

    val streamed = spark.table("gate_out").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val batch = graft.llm.Dedup.defs("llm_neardup_gate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} rows != batch ${batch.size} rows")
  }

  test("a planted near-copy arriving on the stream is flagged against the corpus") {
    import spark.implicits._
    val docs = t(spark, sf, "documents")
    val index = DedupGate.corpusIndex(docs).localCheckpoint()

    // near-copy of corpus doc 0: same text with one token appended — high
    // but sub-1.0 shingle Jaccard; plus one genuinely novel doc
    val base = docs.filter(col("doc_id") === 0)
      .select(col("text")).as[String].head()
    val incomingDir =
      Files.createTempDirectory("graft-gate2").toString + "/incoming"
    Seq((900001L, base + " appended"), (900002L, "nothing like the corpus at all"))
      .toDF("doc_id", "text").write.parquet(incomingDir)

    val stream = spark.readStream.schema(docsSchema).parquet(incomingDir)
    EventStreams.runToMemory(
      DedupGate.gate(stream, index, minJaccard = 0.5), "gate_planted")

    val out = spark.table("gate_planted")
      .select("new_id", "dup_of", "jaccard").collect()
    val hits = out.filter(_.getLong(0) == 900001L)
    assert(hits.exists(_.getLong(1) == 0L),
      s"near-copy not flagged against doc 0: ${out.mkString(", ")}")
    val j = hits.find(_.getLong(1) == 0L).get.getDouble(2)
    assert(j > 0.8 && j < 1.0, s"unexpected jaccard $j for a one-token edit")
    assert(!out.exists(_.getLong(0) == 900002L),
      "novel doc must pass the gate unflagged")
  }

  test("gate is micro-batch-boundary invariant: maxFilesPerTrigger=1 ≡ one batch") {
    val docs = t(spark, sf, "documents")
    val index = DedupGate.corpusIndex(
      docs.filter(pmod(col("doc_id"), lit(10)) < 9)).localCheckpoint()
    // several single-file drops → several micro-batches
    val dir = Files.createTempDirectory("graft-gate-mb").toString + "/incoming"
    docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      .select("doc_id", "text").repartition(4).write.parquet(dir)
    val stream = spark.readStream.schema(docsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = DedupGate.gate(stream, index, minJaccard = 0.2)
      .writeStream.format("memory").queryName("gate_mb").start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(batches > 1, s"expected several micro-batches, got $batches")
    val streamed = spark.table("gate_mb").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val batch = graft.llm.Dedup.defs("llm_neardup_gate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(streamed == batch,
      "result must not depend on where micro-batch boundaries fall")
  }

  test("streamed embedding gate over file replay equals the batch twin exactly") {
    import org.apache.spark.sql.types._
    val emb = t(spark, sf, "embeddings")
    val index = graft.streaming.DedupGate.embedIndex(
      emb.filter(pmod(col("vec_id"), lit(10)) < 9)).localCheckpoint()

    val incomingDir =
      Files.createTempDirectory("graft-egate").toString + "/incoming"
    emb.filter(pmod(col("vec_id"), lit(10)) === 9)
      .select("vec_id", "embedding").write.parquet(incomingDir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema).parquet(incomingDir)
    EventStreams.runToMemory(
      graft.streaming.DedupGate.embedGate(stream, index, minCos = 0.30),
      "egate_out")

    val streamed = spark.table("egate_out").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val batch = graft.llm.Dedup.defs("llm_embed_gate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} rows != batch ${batch.size} rows")
  }

  test("gate hits agree with the exact-Jaccard anchor (subset, same values)") {
    // cross-operator invariant: every pair the gate admits must exist in
    // llm_ngram_jaccard's exact pair set with the SAME jaccard — the gate
    // is a recall-bounded view of the anchor, never a different metric
    val gate = graft.llm.Dedup.defs("llm_neardup_gate")(spark, sf).collect()
      .map(r => ((math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))),
        math.round(r.getDouble(2) * 1e9))).toMap
    val exact = graft.llm.TextOps.defs("llm_ngram_jaccard")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        math.round(r.getDouble(3) * 1e9))).toMap
    gate.foreach { case (pair, j) =>
      assert(exact.get(pair).contains(j),
        s"gate pair $pair (j=$j) missing or different in the exact anchor")
    }
  }

  test("streamed fuzzy-identity gate equals the er_fuzzy_gate batch twin") {
    val recs = graft.queries.EntityRes.records(spark, sf).localCheckpoint()
    val off = graft.queries.EntityRes.ridOffset(spark, sf)
    val index = DedupGate.fuzzyIndex(recs.filter(col("rid") < off))
      .localCheckpoint()
    val incomingDir =
      Files.createTempDirectory("graft-fuzzy").toString + "/incoming"
    recs.filter(col("rid") >= off).write.parquet(incomingDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(incomingDir)
    EventStreams.runToMemory(
      DedupGate.fuzzyGate(stream, index, minJw = 0.9), "fuzzy_out")
    val streamed = spark.table("fuzzy_out").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val batch = SparkEntry.queries("er_fuzzy_gate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(streamed == batch,
      s"streamed ${streamed.size} != batch ${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("the gate plan is stateless: no state store operators under streaming") {
    val docs = t(spark, sf, "documents")
    val index = DedupGate.corpusIndex(
      docs.filter(pmod(col("doc_id"), lit(10)) < 9)).localCheckpoint()
    val incomingDir =
      Files.createTempDirectory("graft-gate3").toString + "/incoming"
    docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      .select("doc_id", "text").limit(5).write.parquet(incomingDir)
    val stream = spark.readStream.schema(docsSchema).parquet(incomingDir)
    val q = DedupGate.gate(stream, index, minJaccard = 0.2)
      .writeStream.format("memory").queryName("gate_plan").start()
    q.processAllAvailable()
    val plan = q.lastProgress.stateOperators
    q.stop()
    assert(plan == null || plan.isEmpty,
      s"gate must run stateless, found state operators: ${plan.mkString(",")}")
  }
}
