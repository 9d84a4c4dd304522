package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe point-in-interval join (SURVEY §2 "as-of / interval join",
  * companion to [[AsOf]]): match each point row to every interval
  * containing it WITHOUT a nested-loop join.
  *
  * Spark plans a plain `p.ts >= i.start && p.ts < i.end` condition as
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) and an OOM once the
  * interval side outgrows a broadcast. Bucketing makes it an equi-join:
  * every interval is exploded to the time buckets it overlaps, every point
  * maps to exactly ONE bucket, and the join keys on the bucket with the
  * exact containment predicate as a residual filter. Cost becomes
  * O(|points| + |intervals|·avg_buckets + |matches|), all hash-partitioned.
  * A point has one bucket, so no candidate pair is produced twice — no
  * dedup pass needed.
  *
  * `bucketSeconds` trades explode factor against candidate precision: set
  * it near the typical interval length so each interval lands in ~1-2
  * buckets.
  */
object IntervalJoin {

  /** @param points    (…, `tsCol`: timestamp)
    * @param intervals (…, `startCol`, `endCol`: timestamps, half-open
    *                  [start, end))
    * @return points ⋈ intervals rows for every containment match */
  def joinPointInInterval(points: DataFrame, intervals: DataFrame,
                          tsCol: String, startCol: String, endCol: String,
                          bucketSeconds: Long = 3600L): DataFrame = {
    val pb = points.withColumn("__bucket",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    // empty intervals match nothing — and sequence(a, b) with b < a would
    // count DOWN, fabricating wrong buckets
    val ib = intervals.filter(col(endCol) > col(startCol)).withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        // end is exclusive: a zero-length or bucket-aligned end still
        // covers the bucket of (end - 1s) and no further
        floor((unix_timestamp(col(endCol)) - 1) / bucketSeconds))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
