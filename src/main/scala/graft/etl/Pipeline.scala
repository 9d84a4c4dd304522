package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** EP1 end-to-end (SURVEY.md §3): the reference's
  * `python/ingest_data.py main()` dataflow as one declarative Spark job —
  * zones refresh (truncate-replace) + trips monthly load (normalize →
  * idempotent partitioned write). Download (A1) happens outside the
  * engine, exactly as the reference separates fetch from load.
  */
object Pipeline {

  final case class Conf(
      tripsSource: String,
      zonesSource: String,
      warehouse: String)

  /** Zones: CSV → normalize → truncate-replace dimension (A3, A4, A9). */
  def refreshZones(spark: SparkSession, conf: Conf): DataFrame = {
    val raw = spark.read.option("header", "true").csv(conf.zonesSource)
    val zones = Normalize.normalizeZones(raw)
    Writers.writeDimension(zones, s"${conf.warehouse}/taxi_zones")
    zones
  }

  /** Trips: Parquet → normalize (multi-candidate resolution, coerce-to-NULL,
    * null-rejection) → month-partitioned dynamic-overwrite write (A2,
    * A4–A8). Re-running the same month is idempotent. */
  def loadTrips(spark: SparkSession, conf: Conf): DataFrame = {
    val raw = spark.read.parquet(conf.tripsSource)
    val trips = Normalize.withTripId(Normalize.normalizeTrips(raw))
    Writers.writeTripsMonthly(trips, s"${conf.warehouse}/taxi_trips")
    trips
  }

  def run(spark: SparkSession, conf: Conf): Unit = {
    refreshZones(spark, conf)
    loadTrips(spark, conf)
  }
}
