package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north_star): image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct, plus
  * decode / feature-extract / frame-sample operators.
  *
  * The DECODE KERNELS ARE STUBS — this container has no image/audio codecs,
  * so `decodeStub` produces a deterministic fake feature vector from the
  * bytes. Everything Spark-side is real and tested in `MultimodalSpec`:
  * the schema contract, the `binaryFile` source mapping, partition-sized
  * batching via `mapPartitions` (the Scala analogue of `mapInPandas` —
  * one iterator per partition, so a real decoder would amortize model
  * init per-partition, not per-row), and the output schema.
  */
object Multimodal {

  /** Contract for a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Map Spark's `binaryFile` source (path, modificationTime, length,
    * content) into the asset contract. */
  def fromBinaryFiles(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(
        xxhash64(col("path")).as("asset_id"),
        col("content").as("payload"),
        struct(
          regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1).as("format"),
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          lit(null).cast(IntegerType).as("n_frames")).as("meta"))

  /** STUB decode kernel: deterministic pseudo-features from payload bytes.
    * A real implementation would replace ONLY the body of `features` —
    * batch shape, schema, and partitioning stay identical. */
  private def fakeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      out(j) = ((h % 1000L).toFloat / 1000.0f); j += 1
    }
    out
  }

  /** Decode+featurize: binary payload → `array<float>` feature column.
    * Runs per-partition so heavyweight decoder state (a model, a codec
    * context) initializes once per task at scale. */
  def decodeStub(assets: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(assets.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    assets.mapPartitions { rows =>
      // per-partition init happens here (stub: nothing to init)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats = if (payload == null) null else fakeFeatures(payload, dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
  }

  /** Asset inventory profile: (file_name, fmt, byte_len, sha) per binary
    * asset — the manifest/integrity pass every multimodal ingest runs
    * before decode. Hash is sha256 over the UPPERCASE-HEX rendering of the
    * payload (not the raw bytes) because that is the strongest digest both
    * the engine and the DuckDB oracle can compute over blobs — DuckDB 1.0's
    * sha256 only accepts VARCHAR, and its BLOB→VARCHAR cast escapes
    * non-printable bytes; `hex()` is uppercase in both engines, making the
    * digest cross-checkable byte-for-byte. */
  def fileMeta(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir).select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
      regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1).as("fmt"),
      length(col("content")).cast(LongType).as("byte_len"),
      sha2(hex(col("content")), 256).as("sha_hex"))

  type Q = (SparkSession, String) => DataFrame

  /** Committed deterministic fixture assets (LCG byte streams — see
    * fixtures/multimodal/) so the binary-column contract has a
    * hash-checkable oracle row like every other operator family. */
  val fixtureDir = "/root/repo/fixtures/multimodal"

  val defs: Map[String, Q] = Map(
    "llm_multimodal_meta" -> ((s, _) => fileMeta(s, fixtureDir)))

  val sql: Map[String, String] = Map(
    "llm_multimodal_meta" -> """
      SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
             regexp_extract(filename, '\.([A-Za-z0-9]+)$', 1) AS fmt,
             octet_length(content) AS byte_len,
             sha256(hex(content)) AS sha_hex
      FROM read_blob('/root/repo/fixtures/multimodal/*')""")

  /** Frame-sampling operator for video-like payloads: emit every k-th
    * chunk of the payload as its own row (stub chunking = fixed-size
    * byte windows standing in for decoded frames). */
  def sampleFrames(assets: DataFrame, chunkBytes: Int = 1024, everyK: Int = 10): DataFrame =
    assets
      .withColumn("n_chunks",
        greatest(lit(1), (length(col("payload")) / chunkBytes).cast(IntegerType)))
      .withColumn("frame_idx",
        explode(expr(s"filter(sequence(0, n_chunks - 1), i -> i % $everyK = 0)")))
      .withColumn("frame_payload",
        expr(s"substring(payload, frame_idx * $chunkBytes + 1, $chunkBytes)"))
      .drop("n_chunks")
}
