package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Keyed point-in-interval range join: pairs every point row with the
 * interval rows of the same key that contain it (`lo <= pt <= hi`).
 *
 * Catalyst plans a raw inequality join as a nested loop (broadcast NLJ or
 * cartesian) — quadratic per key. This composition stays an EQUI-join:
 * intervals explode to the fixed-width buckets they cover, points map to
 * their bucket, and the join runs on (key, bucket) with the exact range
 * predicate as a post-filter. Each (point, interval) pair meets in exactly
 * one bucket (the point's), so no dedup pass is needed. Cost: |intervals|
 * inflates by avg span/bucketWidth — pick bucketWidth near the typical
 * interval span; shuffle stays hash-partitioned and AQE-splittable.
 */
object RangeJoin {

  /**
   * @param points     rows with (key, pt)
   * @param intervals  rows with (key, lo, hi), lo <= hi
   * @param key        equality key column name (same name both sides)
   * @param pt         point column (integral)
   * @param lo         interval start column (inclusive)
   * @param hi         interval end column (inclusive)
   * @param bucketWidth bucket size in the point's units
   */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pt: String,
      lo: String,
      hi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Integral `div`, not `/`: timestamps in nanos exceed double's exact
    // integer range (2^53), so float bucket math would mis-bucket.
    val iv = intervals.withColumn(
      "__bucket",
      explode(sequence(
        expr(s"CAST($lo AS BIGINT) div $bucketWidth"),
        expr(s"CAST($hi AS BIGINT) div $bucketWidth"))))
    val p = points.withColumn("__bucket", expr(s"CAST($pt AS BIGINT) div $bucketWidth"))
    p.join(iv, Seq(key, "__bucket"))
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("__bucket")
  }
}
