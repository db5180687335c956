package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) layout clustering — the data-layout optimization that
 * makes BOTH of two filter columns prunable from the same physical sort:
 * interleave the low bits of the two keys, range-partition on the
 * interleaved value, and every output file covers a small aligned tile of
 * the (x, y) plane, so min/max file statistics prune scans filtered on
 * EITHER column (a lexicographic sort only prunes the leading one).
 *
 * At 100 TB this is a write-path operator: one range shuffle at write
 * time buys every subsequent scan two-dimensional partition pruning. The
 * z-value itself is a narrow bitwise projection (shift/AND/OR per bit,
 * all codegen'd built-ins, no shuffle).
 */
object Layout {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions): zValue(x, y) bit 2i = x bit i, bit 2i+1 = y bit i.
    * Inputs must be non-negative longs. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The write path: cluster `df` into `numFiles` z-ordered ranges of the
    * interleaved (xCol, yCol) low-`bits` key. One range shuffle; each
    * output partition covers a compact z-range = a small (x, y) tile. */
  def clusterByZ(df: DataFrame, xCol: Column, yCol: Column, bits: Int, numFiles: Int): DataFrame = {
    val mask = (1L << bits) - 1
    val z = zValue(xCol.bitwiseAND(lit(mask)), yCol.bitwiseAND(lit(mask)), bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** The pruning evidence: assign each row to its aligned z-file
    * (top `fileBits` bits of the z-value) and report per-file row counts
    * and min/max of both dims — the file-statistics table a scan planner
    * prunes against. With aligned files each tile spans at most
    * 2^(bits - ceil(fileBits/2)) values per dimension. One aggregation
    * shuffle carrying (file_id, partials); the bit math is narrow. */
  def zFileStats(df: DataFrame, xCol: Column, yCol: Column, bits: Int, fileBits: Int): DataFrame = {
    require(fileBits >= 1 && fileBits <= 2 * bits, "fileBits must be in [1, 2*bits]")
    val mask = (1L << bits) - 1
    df.select(xCol.bitwiseAND(lit(mask)).as("x"), yCol.bitwiseAND(lit(mask)).as("y"))
      .withColumn("file_id", shiftright(zValue(col("x"), col("y"), bits), 2 * bits - fileBits))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }
}
