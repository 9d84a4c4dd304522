package graft.etl

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file source/sink built directly on the Avro core +
  * avro-mapred libraries that ship with Spark (`/opt/spark/jars`): the
  * `spark-avro` DataSource artifact is a SEPARATE published jar that the
  * zero-egress sandbox cannot resolve, but nothing about the FORMAT needs
  * it — reference `python/ingest_data.py`'s role as the format-bridging
  * ingest step (file:69-85 pulls an external table into the warehouse).
  *
  * Scale shape:
  *  - WRITE: one container file per partition via `mapPartitionsWithIndex`
  *    (the documented last-resort tier — there is no built-in operator to
  *    compose for a missing format). Executors write through the Hadoop
  *    filesystem of the target path, so the same code lays files onto
  *    local disk, HDFS, or an object store; file count = partition count,
  *    exactly like the parquet sink.
  *  - READ: `avro-mapred`'s AvroKeyInputFormat, which SPLITS container
  *    files on their sync markers — a 100 TB avro directory reads with
  *    block-level parallelism like any Hadoop input, then converts to
  *    rows once, before any shuffle.
  *
  * Type bridge (both directions): BIGINT↔long, INT↔int, DOUBLE↔double,
  * FLOAT↔float, STRING↔string (Utf8 normalized), BOOLEAN↔boolean,
  * BINARY↔bytes; every field nullable via the standard [null, T] union.
  */
object AvroIO {

  /** Spark → Avro schema (nullable unions, field order preserved). */
  def avroSchema(st: StructType, name: String = "graft_record"): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"AvroIO: unsupported Spark type $other")
    }
    val fields = st.fields.map { f =>
      val s = Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), prim(f.dataType)))
      new Schema.Field(f.name, s, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** Write `df` as a directory of Avro container files, one per
    * partition. Overwrites `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    val fs = FileSystem.get(new java.net.URI(path).resolve("/"),
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    val names = st.fieldNames
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val exFs = FileSystem.get(
          new java.net.URI(path).resolve("/"), new Configuration())
        val out = exFs.create(new Path(path, f"part-$pid%05d.avro"), true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        var n = 0L
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            val v = r.get(i) match {
              case null => null
              case s: String => s
              case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
              case other => other
            }
            rec.put(names(i), v)
            i += 1
          }
          w.append(rec)
          n += 1
        }
        w.close()
        Iterator.single(n)
      }
    }.count() // the action that performs the distributed write
  }

  /** Read a directory of Avro container files as a DataFrame with the
    * given schema (field lookup by name; missing fields → null). */
  def read(spark: SparkSession, path: String, st: StructType): DataFrame = {
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.AvroKeyInputFormat
    import org.apache.hadoop.io.NullWritable
    val fields = st.fields.map(f => (f.name, f.dataType))
    val rows = spark.sparkContext.newAPIHadoopFile(
        s"$path/*.avro",
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable])
      .map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(fields.toSeq.map { case (name, dt) =>
          (rec.get(name), dt) match {
            case (null, _) => null
            case (u: org.apache.avro.util.Utf8, StringType) => u.toString
            case (s: CharSequence, StringType) => s.toString
            case (b: java.nio.ByteBuffer, BinaryType) =>
              val a = new Array[Byte](b.remaining()); b.get(a); a
            case (v, _) => v
          }
        })
      }
    spark.createDataFrame(rows, st)
  }
}
