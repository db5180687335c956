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

  test("winsorStats: hand-checkable p5/p95 clip on 100 uniform values") {
    // 1..100: lower p5 = 5th smallest = 5, p95 = 95. Clipped sum =
    // 5*5 + sum(5..95) + 5*95 = 5050 - (1+2+3+4) - (96+..+100) + 4*5 + 5*95...
    // computed directly below from first principles.
    val vals = (1 to 100).map(_.toDouble)
    val df = vals.map(("g", _)).toDF("g", "v")
    val got = Robust.winsorStats(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length === 1)
    val (_, loB, hiB, n, nLo, nHi, wmean) = got.head
    val scale = Median.Scale.toLong
    assert(loB === 5L * scale)
    assert(hiB === 95L * scale)
    assert(n === 100L)
    assert(nLo === 4L) // 1..4 below the p5 bin
    assert(nHi === 5L) // 96..100 above the p95 bin
    val expectedSum = vals.map(v => math.min(math.max(v, 5.0), 95.0)).sum
    assert(wmean === expectedSum * scale / (100.0 * Median.Scale))
  }

  test("winsorStats property: matches a driver-side clip on random grouped data") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map { i =>
      (s"g${i % 2}", if (i % 41 == 0) 1000.0 * rnd.nextDouble() else rnd.nextDouble() * 20)
    }
    def lowerQ(bins: Seq[Long], num: Int, den: Int): Long = {
      val s = bins.sorted
      s(((s.size.toLong * num + den - 1) / den - 1).toInt.max(0))
    }
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val bins = rs.map(r => math.floor(r._2 * Median.Scale).toLong)
      val lo = lowerQ(bins, 5, 100)
      val hi = lowerQ(bins, 95, 100)
      val clamped = bins.map(b => math.min(math.max(b, lo), hi))
      (g, lo, hi, bins.size.toLong, bins.count(_ < lo).toLong, bins.count(_ > hi).toLong,
        clamped.sum.toDouble / (bins.size * Median.Scale))
    }.toSet
    val got = Robust.winsorStats(rows.toDF("g", "v"), "g", "v")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got === expected)
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
