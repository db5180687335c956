package graft

import graft.functions.Median
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the bounded-memory binned median (the quality_gate /
  * pipeline_train_prep replacement for the exact-percentile aggregate —
  * cross-engine parity is covered by those queries' DuckDB oracles). */
class MedianSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("binnedMedianPerGroup: lower median per group, exact at 2^-20 granularity") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), // odd: median = 2.0
      ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0), // even: LOWER median = 2.0
      ("c", 7.5) // singleton
    ).toDF("g", "v").withColumn("qb", Median.bin(col("v")))
    val med = Median.binnedMedianPerGroup(df, "g", "qb")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(med("a") == (2.0 * Median.Scale).toLong)
    assert(med("b") == (2.0 * Median.Scale).toLong)
    assert(med("c") == (7.5 * Median.Scale).toLong)
  }

  test("bin is an exact exponent shift: distinct doubles 2^-20 apart get distinct bins") {
    val step = 1.0 / Median.Scale
    val vals = Seq(0.0, step, 2 * step, -step, 1.25, 1.25 + step)
    val bins = vals.toDF("v").select(Median.bin(col("v"))).as[Long].collect()
    assert(bins.distinct.length == vals.length)
    assert(bins(0) == 0L && bins(1) == 1L && bins(3) == -1L)
  }

  test("property: gate keeps exactly {v : bin(v) >= lower-median bin}, any data") {
    // Driver-side reference: lower median = the ceil(n/2)-th smallest bin.
    import org.scalacheck.{Gen, rng}
    val valGen = Gen.oneOf(
      Gen.chooseNum(-5.0, 2.0), // quality-score-like range
      Gen.chooseNum(-3, 3).map(_.toDouble), // heavy ties across groups
      Gen.const(0.0))
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("a", "b", "c"), valGen))
    val seed = rng.Seed(20260812L)
    val cases = Iterator.iterate((seed, List.empty[List[(String, Double)]])) {
      case (s, acc) =>
        val r = rowsGen.pureApply(Gen.Parameters.default.withSize(40), s)
        (s.next, r :: acc)
    }.drop(30).next()._2
    for (rows <- cases) {
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
        .toDF("g", "id", "v")
      val kept = graft.functions.Median.gateAtBinnedMedian(df, "g", "v")
        .select("id").as[Long].collect().toSet
      val expected = rows.zipWithIndex.groupBy(_._1._1).flatMap { case (_, members) =>
        val bins = members.map { case ((_, v), _) => math.floor(v * Median.Scale).toLong }
        val med = bins.sorted.apply((bins.size + 1) / 2 - 1)
        members.collect {
          case ((_, v), i) if math.floor(v * Median.Scale).toLong >= med => i.toLong
        }
      }.toSet
      assert(kept == expected, s"rows=$rows")
    }
  }

  test("gateAtBinnedMedian keeps exactly the rows at or above the group median bin") {
    val df = Seq(
      ("a", 10L, 1.0), ("a", 11L, 2.0), ("a", 12L, 3.0),
      ("b", 20L, 5.0), ("b", 21L, 5.0) // all-equal group: everything kept
    ).toDF("g", "id", "v")
    val kept = Median.gateAtBinnedMedian(df, "g", "v")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(11L, 12L, 20L, 21L))
    // column order/shape preserved
    assert(Median.gateAtBinnedMedian(df, "g", "v").columns.toSeq == Seq("g", "id", "v"))
  }
}
