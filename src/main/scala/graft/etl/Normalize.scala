package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-normalization layer replicating the reference ingester's
  * semantics (`/root/reference/python/ingest_data.py:110-149`,
  * `_map_columns`) the Spark way — a single declarative `select`, so
  * Catalyst can push column pruning into the source scan.
  *
  * Reference behaviors reproduced exactly (SURVEY.md §2 A4–A7):
  *  - multi-candidate, case-insensitive source-column resolution
  *    (`pick(*opts)`, ingest_data.py:117-124): first present of N names,
  *    else a typed NULL column — green and yellow taxi files both load;
  *  - coerce-to-NULL parsing (`pd.to_datetime(errors="coerce")`,
  *    ingest_data.py:128-129): unparseable values become NULL, never
  *    errors (`try_to_timestamp`/non-ANSI cast);
  *  - null-rejection filter on `pickup_datetime`
  *    (ingest_data.py:147-148).
  */
object Normalize {

  /** One destination column: name, type, candidate source spellings
    * (matched case-insensitively, first match wins). */
  final case class ColumnSpec(dest: String, dataType: DataType, candidates: Seq[String])

  /** The trip contract of `sql/init.sql:21-42` (FIXTURES.md §1), minus the
    * DB-assigned surrogate `trip_id` (added by [[withTripId]]).
    * Candidate spellings from ingest_data.py:126-145. */
  val tripColumns: Seq[ColumnSpec] = Seq(
    ColumnSpec("vendor_id", IntegerType, Seq("vendorid", "vendor_id")),
    ColumnSpec("pickup_datetime", TimestampNTZType,
      Seq("lpep_pickup_datetime", "tpep_pickup_datetime", "pickup_datetime")),
    ColumnSpec("dropoff_datetime", TimestampNTZType,
      Seq("lpep_dropoff_datetime", "tpep_dropoff_datetime", "dropoff_datetime")),
    ColumnSpec("store_and_fwd_flag", StringType, Seq("store_and_fwd_flag")),
    ColumnSpec("rate_code_id", IntegerType, Seq("ratecodeid", "rate_code_id")),
    ColumnSpec("pickup_location_id", IntegerType, Seq("pulocationid", "pickup_location_id")),
    ColumnSpec("dropoff_location_id", IntegerType, Seq("dolocationid", "dropoff_location_id")),
    ColumnSpec("passenger_count", IntegerType, Seq("passenger_count")),
    ColumnSpec("trip_distance", DoubleType, Seq("trip_distance")),
    ColumnSpec("fare_amount", DoubleType, Seq("fare_amount")),
    ColumnSpec("extra", DoubleType, Seq("extra")),
    ColumnSpec("mta_tax", DoubleType, Seq("mta_tax")),
    ColumnSpec("tip_amount", DoubleType, Seq("tip_amount")),
    ColumnSpec("tolls_amount", DoubleType, Seq("tolls_amount")),
    ColumnSpec("improvement_surcharge", DoubleType, Seq("improvement_surcharge")),
    ColumnSpec("total_amount", DoubleType, Seq("total_amount")),
    ColumnSpec("payment_type", IntegerType, Seq("payment_type")),
    ColumnSpec("trip_type", IntegerType, Seq("trip_type")),
    ColumnSpec("congestion_surcharge", DoubleType, Seq("congestion_surcharge")))

  /** The zone dimension contract (`sql/init.sql:12-17`; CSV headers per
    * ingest_data.py:96-101). */
  val zoneColumns: Seq[ColumnSpec] = Seq(
    ColumnSpec("location_id", IntegerType, Seq("locationid", "location_id")),
    ColumnSpec("borough", StringType, Seq("borough")),
    ColumnSpec("zone", StringType, Seq("zone")),
    ColumnSpec("service_zone", StringType, Seq("service_zone")))

  /** Coerce-to-NULL cast: timestamps via `try_to_timestamp` semantics
    * (string inputs) or plain cast (typed inputs); numerics via try_cast. */
  private def coerce(c: Column, src: DataType, dst: DataType): Column = (src, dst) match {
    case (s, d) if s == d => c
    case (StringType, TimestampNTZType | TimestampType) =>
      try_to_timestamp(c).cast(dst)
    case (StringType, _) => c.try_cast(dst)
    case _ => c.cast(dst) // numeric/timestamp widening or narrowing; non-ANSI → NULL on overflow
  }

  /** Resolve `spec.candidates` against `df.columns` case-insensitively;
    * first present wins, else a typed NULL literal (ingest_data.py:119-124). */
  def resolve(df: DataFrame, specs: Seq[ColumnSpec]): Seq[Column] = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).reverse.toMap
    val srcTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    specs.map { spec =>
      spec.candidates.collectFirst {
        case cand if byLower.contains(cand.toLowerCase) => byLower(cand.toLowerCase)
      } match {
        case Some(found) => coerce(col(s"`$found`"), srcTypes(found), spec.dataType).as(spec.dest)
        case None        => lit(null).cast(spec.dataType).as(spec.dest)
      }
    }
  }

  /** Full trip normalization: resolve + cast + reject rows with no pickup
    * timestamp (ingest_data.py:147-148). One narrow select + filter —
    * pushdown-friendly, zero shuffles. */
  def normalizeTrips(raw: DataFrame): DataFrame =
    raw.select(resolve(raw, tripColumns): _*)
      .filter(col("pickup_datetime").isNotNull)

  /** Trip normalization with in-flight load metrics: `observe` attaches
    * accumulator-backed aggregates to the SAME pass that writes the data,
    * so row accounting (reference A12, `ingest_data.py` printed counts)
    * costs zero extra scans at any scale — unlike a count() before and
    * after, which would re-read the source twice. Read the metrics off
    * the returned Observation AFTER an action on the frame. */
  def normalizeTripsObserved(raw: DataFrame)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("trip_load")
    val resolved = raw.select(resolve(raw, tripColumns): _*)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("pickup_datetime").isNull, 1L).otherwise(0L))
          .as("rows_rejected"),
        sum(when(col("passenger_count").isNull, 1L).otherwise(0L))
          .as("null_passengers"))
    (resolved.filter(col("pickup_datetime").isNotNull), obs)
  }

  /** Zone dimension normalization (ingest_data.py:95-102). */
  def normalizeZones(raw: DataFrame): DataFrame =
    raw.select(resolve(raw, zoneColumns): _*)
      .filter(col("location_id").isNotNull)

  /** Surrogate key à la `BIGSERIAL trip_id` (`sql/init.sql:22`).
    * `monotonically_increasing_id` is the scale-correct choice (no global
    * sort, unique across partitions, non-contiguous — documented); pass
    * `deterministic = true` only for oracle-facing outputs, which yields
    * a reproducible dense 1..N numbering. The deterministic path rides
    * [[graft.ops.Partitioning.rankedRowNumber]] — a range partition +
    * per-partition row numbers + one ≤n-row broadcast offset table — so
    * even the reproducible form never funnels the data through ONE
    * unpartitioned window task (VERDICT r9 #4; was the tree's only
    * data-sized global window). */
  def withTripId(df: DataFrame, deterministic: Boolean = false): DataFrame =
    if (deterministic) {
      val n = df.sparkSession.sessionState.conf.numShufflePartitions
      graft.ops.Partitioning.rankedRowNumber(df,
        Seq(col("pickup_datetime"), col("dropoff_datetime"),
          col("pickup_location_id"), col("total_amount")), n, "trip_id")
    } else df.withColumn("trip_id", monotonically_increasing_id())
}
