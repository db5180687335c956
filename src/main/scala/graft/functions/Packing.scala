package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing: concatenate a corpus's token stream in id order and
 * cut it every `packLen` tokens; each document is tagged with the pack it
 * starts in and its offset there — the "pack documents into fixed-length
 * training contexts" stage.
 *
 * The global running total is a THREE-level distributed prefix sum in
 * which every level is either partitioned or metadata-scale:
 *   1. in-bucket cumulative window (partitionBy bucket, <=64-row frames);
 *   2. in-superbucket cumulative window over bucket totals
 *      (partitionBy sb, <=16384-row frames);
 *   3. superbucket prefix via a broadcast non-equi join over the
 *      n/2^20-row superbucket totals (~10k rows even at 10^10 docs) —
 *      map-side aggregated, so no single-task window ever exists in the
 *      plan (PlanSpec gates the whole query map on this).
 * Divisions are integer `div`, exact past 2^53 cumulative tokens where
 * floor(x/y)'s double round-trip would drift off BIGINT semantics.
 *
 * Ids may be sparse (e.g. packing the survivors of a cleaning pipeline):
 * bucket boundaries come from `id div 64`, so gaps only make buckets
 * smaller, never wrong.
 */
object Packing {

  /** Input: one row per document with a long-valued `idCol` (the packing
    * order) and a long `tokenCol`. Output columns: idCol, n_tokens,
    * pack_id, pack_offset. */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      packLen: Int = 512): DataFrame = {
    require(packLen > 0, "packLen must be positive")
    val tk = df
      .select(col(idCol), col(tokenCol).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"$idCol div 64"))
      .withColumn("sb", expr(s"$idCol div 1048576")) // 64 docs * 16384 buckets
    val inBucket = tk.withColumn(
      "cum",
      sum(col("n_tokens")).over(
        Window.partitionBy(col("bucket")).orderBy(col(idCol))))
    val bucketTot = tk.groupBy(col("sb"), col("bucket"))
      .agg(sum(col("n_tokens")).as("btok"))
    val inSb = bucketTot.withColumn(
      "cum_b",
      sum(col("btok")).over(
        Window.partitionBy(col("sb")).orderBy(col("bucket"))))
    val sbTot = bucketTot.groupBy(col("sb")).agg(sum(col("btok")).as("stok"))
    val sbBefore = sbTot
      .join(broadcast(sbTot.select(col("sb").as("sb2"), col("stok").as("stok2"))),
        col("sb2") < col("sb"), "left")
      .groupBy(col("sb"))
      .agg(coalesce(sum(col("stok2")), lit(0L)).as("sb_before"))
    val bucketBefore = inSb
      .join(sbBefore, "sb")
      .select(col("bucket"),
        (col("sb_before") + col("cum_b") - col("btok")).as("bucket_before"))
    inBucket
      .join(bucketBefore, "bucket")
      .withColumn("before", col("bucket_before") + col("cum") - col("n_tokens"))
      .select(
        col(idCol),
        col("n_tokens"),
        expr(s"before div $packLen").as("pack_id"),
        (col("before") % packLen).as("pack_offset"))
  }
}
