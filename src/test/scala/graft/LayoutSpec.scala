package graft

import graft.functions.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: interleave correctness and the two-dimensional
  * pruning bound the clustering exists to provide. */
class LayoutSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("zValue: known interleavings") {
    val df = Seq((3L, 0L), (0L, 3L), (255L, 255L), (1L, 2L), (0L, 0L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z"))
    // x fills even bits, y odd: (3,0)->0b0101, (0,3)->0b1010,
    // (1,2)->bit0 + bit3 = 9, (255,255)->all 16 bits.
    assert(df.as[Long].collect().toSeq === Seq(5L, 10L, 65535L, 9L, 0L))
  }

  test("zValue: round-trips against a driver-side interleave on random keys") {
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    val rnd = new scala.util.Random(11)
    val keys = (1 to 300).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = keys.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z")).as[Long].collect()
    assert(got.toSeq === keys.map { case (x, y) => ref(x, y) })
  }

  test("zFileStats: every aligned z-file is a 32x32 tile (both dims prunable)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val stats = Layout
      .zFileStats(li, col("l_partkey"), col("l_suppkey"), bits = 8, fileBits = 6)
      .collect()
    assert(stats.nonEmpty)
    val total = stats.map(_.getLong(1)).sum
    assert(total === li.count())
    for (r <- stats) {
      val fid = r.getLong(0)
      assert(fid >= 0 && fid < 64, s"file_id $fid out of range")
      assert(r.getLong(3) - r.getLong(2) <= 31, s"x spread too wide in file $fid: $r")
      assert(r.getLong(5) - r.getLong(4) <= 31, s"y spread too wide in file $fid: $r")
    }
  }

  test("clusterByZ: partitions hold compact tiles vs a 1-D sort's full-y spread") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey").bitwiseAND(lit(255L)).as("x"),
        col("l_suppkey").bitwiseAND(lit(255L)).as("y"))
    val spreads = Layout.clusterByZ(li, col("x"), col("y"), bits = 8, numFiles = 16)
      .groupBy(spark_partition_id().as("pid"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .select("sx", "sy").as[(Long, Long)].collect()
    // Range partitioning cuts the z-line into ~16 contiguous runs whose
    // SAMPLED boundaries are unaligned, so individual runs can straddle
    // tile boundaries — but the typical run still covers a compact
    // super-tile, where a 1-D x-sort spreads y across the full 0..255 in
    // EVERY partition. Assert the aggregate compactness, robust to
    // sampling jitter.
    assert(spreads.nonEmpty)
    val meanX = spreads.map(_._1).sum.toDouble / spreads.size
    val meanY = spreads.map(_._2).sum.toDouble / spreads.size
    assert(meanX <= 160, s"mean x spread $meanX")
    assert(meanY <= 160, s"mean y spread $meanY")
  }
}
