package graft

import graft.functions.{Median, Robust}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Median/MAD outlier semantics (cross-engine parity is anomaly_mad's
  * DuckDB oracle; here: hand-checkable fixtures + the histogram-derived
  * deviation rebinning). */
class RobustSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("medianMadPerGroup: hand-computed median and MAD per group") {
    // a: values 1..4 + 100 -> med 3 (lower median of 5), |dev| = {2,1,0,1,97},
    //    MAD = 1. b: constant 5s -> med 5, MAD 0.
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)
    ).toDF("g", "v")
    val mm = Robust.medianMadPerGroup(df, "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(mm("a") === ((3 * Median.Scale.toLong, 1 * Median.Scale.toLong)))
    assert(mm("b") === ((5 * Median.Scale.toLong, 0L)))
  }

  test("madOutliers flags exactly the >3-MAD tail, never the bulk") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("c", 10.0), ("c", 12.0), ("c", 14.0), ("c", 16.0), ("c", 18.0)
    ).toDF("g", "v")
    // a: med 3, MAD 1 -> only 100.0 (dev 97) exceeds 3 MADs.
    // c: med 14, MAD 2 -> max dev 4 bins*2^20 <= 3*MAD, nothing flagged.
    val out = Robust.madOutliers(df, "g", "v", nMads = 3)
      .select("g", "v").as[(String, Double)].collect().toSet
    assert(out === Set(("a", 100.0)))
  }

  test("property: flagged set == driver-side median/MAD filter on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val g = s"g${i % 3}"
      // Mixed bulk + occasional spike, fractional values exercise binning.
      val v = if (i % 29 == 0) 500.0 + rnd.nextDouble() else rnd.nextDouble() * 10
      (i.toLong, g, v)
    }
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.size - 1) / 2)
    }
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val bins = rs.map(r => math.floor(r._3 * Median.Scale).toLong)
      val med = lowerMedian(bins)
      val mad = lowerMedian(bins.map(b => math.abs(b - med)))
      rs.filter(r => math.abs(math.floor(r._3 * Median.Scale).toLong - med) > 3 * mad)
        .map(_._1)
    }.toSet
    val got = Robust
      .madOutliers(rows.toDF("id", "g", "v"), "g", "v", nMads = 3)
      .select("id").as[Long].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty) // fixture sanity: spikes exist and are caught
  }
}
