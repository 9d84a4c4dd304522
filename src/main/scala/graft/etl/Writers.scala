package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Idempotent sinks replicating the reference's write semantics the Spark
  * way (SURVEY.md §2 A8–A10, §7.4 risk 5):
  *
  *  - reference windowed DELETE + append (`ingest_data.py:160-166`) →
  *    month-partitioned parquet with DYNAMIC partition overwrite: re-running
  *    a month replaces exactly that month's partitions, leaves the rest —
  *    same contract, but job-atomic (commit protocol) instead of
  *    per-chunk transactions, and parallel.
  *  - reference TRUNCATE + append for dims (`ingest_data.py:104-106`) →
  *    `SaveMode.Overwrite`.
  *
  * The cross-month edge (ingest_data.py inserts rows OUTSIDE the delete
  * window too — SURVEY §7.4.5): dynamic overwrite reproduces it exactly,
  * because every month present in the batch gets (re)written, months absent
  * from the batch are untouched.
  */
object Writers {

  /** Fact sink: partition by trip month, dynamic overwrite. At 100 TB the
    * partition column doubles as the pruning key for date-range queries
    * (replaces the reference's `pickup_datetime` B-tree, `init.sql:45`). */
  def writeTripsMonthly(trips: DataFrame, path: String): Unit =
    trips
      .withColumn("trip_month", date_format(col("pickup_datetime"), "yyyy-MM"))
      .write
      .partitionBy("trip_month")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Dimension sink: truncate-and-replace (A9). */
  def writeDimension(dim: DataFrame, path: String): Unit =
    dim.write.mode(SaveMode.Overwrite).parquet(path)

  /** The SURVEY §1.2 NUMERIC escape hatch, made concrete: the reference's
    * DDL declares money columns NUMERIC (`sql/init.sql:32-41`) while its
    * loader materializes float64 — this engine stores double end-to-end
    * and callers who need exact money semantics cast at the writer
    * boundary. Downstream decimal sums are then order-independent
    * (see the `agg_decimal_money` oracle query). */
  def withMoneyDecimals(df: DataFrame, moneyCols: Seq[String],
                        precision: Int = 12, scale: Int = 2): DataFrame =
    moneyCols.foldLeft(df)((acc, c) =>
      acc.withColumn(c, col(c).cast(s"decimal($precision,$scale)")))

  /** JDBC parity sinks (A8/A10) — same SaveMode semantics against a
    * database table; `truncate` avoids dropping indexes on overwrite.
    * Kept as the optional connector (no database in the test env). */
  def appendJdbc(df: DataFrame, url: String, table: String,
                 props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  def overwriteJdbcTruncate(df: DataFrame, url: String, table: String,
                            props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Overwrite).option("truncate", true)
      .jdbc(url, table, props)
}
