package graft

import graft.functions.Ranks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The binned prefix-sum ranks must be BIT-identical to the built-in window
 * functions — that equality is what lets the oracle run the plain WINDOW
 * SQL while the production plan avoids the per-group funnel.
 */
class RanksSpec extends AnyFunSuite with SparkSpec {

  test("distributionRanks == built-in window functions on a skewed fixture") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // Group sizes 1 / 5 / 1003 cover: the n = 1 percent_rank rule, the
    // n > tiles and n < tiles ntile arms, negative bins, and heavy value
    // duplication (multi-row bins straddling quartile boundaries).
    val rows =
      Seq(("solo", 5.5, 1L)) ++
        (1 to 5).map(i => ("tiny", rnd.nextInt(3) + 0.25, 100L + i)) ++
        (1 to 1003).map(i => ("big", (rnd.nextInt(40) - 20) * 0.5, 1000L + i))
    val df = rows.toDF("grp", "v", "id")
    val got = Ranks.distributionRanks(df, "grp", col("v"), col("id"),
      tiles = 4, rankCol = "rnk")
      .select(col("grp"), col("id"), col("rnk"), col("pct_rank"),
        col("cume"), col("quartile"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
    val ref = df.select(col("grp"), col("id"),
      row_number().over(w).cast("long").as("rnk"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      ntile(4).over(w).as("quartile"))
    assert(got.count() === ref.count())
    assert(got.except(ref).count() === 0)
    assert(ref.except(got).count() === 0)
  }

  test("distributionRanks == built-ins on random data with special doubles") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val specials = Array(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, 1e300, -1e300, Long.MaxValue.toDouble * 4)
    // 8 random rounds x random group structure; every round must agree
    // bit-for-bit with the built-in window functions. NULL order values
    // (nulls-first) and a NULL group key are real ranking inputs for the
    // built-in form, so they must rank here too, not vanish in a join.
    for (round <- 1 to 8) {
      val nGroups = 1 + rnd.nextInt(4)
      val rows = (1 to 200).map { i =>
        val v: java.lang.Double =
          if (rnd.nextInt(12) == 0) null
          else if (rnd.nextInt(10) == 0) specials(rnd.nextInt(specials.length))
          else math.floor(rnd.nextGaussian() * 40) / 8 // duplicates + fractional
        val g = if (rnd.nextInt(15) == 0) null else s"g${rnd.nextInt(nGroups)}"
        (g, v, i.toLong)
      }
      val df = rows.toDF("grp", "v", "id")
      val tiles = 1 + rnd.nextInt(6)
      // binScale must never change values, only internal bin spread.
      val binScale = Seq(1.0, 1048576.0, 0.125)(rnd.nextInt(3))
      val got = Ranks.distributionRanks(df, "grp", col("v"), col("id"),
        tiles = tiles, rankCol = "rnk", binScale = binScale)
        .select(col("grp"), col("id"), col("rnk"), col("pct_rank"),
          col("cume"), col("quartile"))
      val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
      val ref = df.select(col("grp"), col("id"),
        row_number().over(w).cast("long").as("rnk"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(tiles).over(w).as("quartile"))
      assert(got.count() === ref.count(), s"round $round (tiles=$tiles)")
      assert(got.except(ref).count() === 0, s"round $round (tiles=$tiles)")
    }
  }

  test("distributionRanks: the only group-wide window runs on the bin frame") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i * 0.5, i.toLong)).toDF("grp", "v", "id")
    val plan = Ranks.distributionRanks(df, "grp", col("v"), col("id"), tiles = 4)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case win: org.apache.spark.sql.catalyst.plans.logical.Window => win
    }
    // One window partitions by (grp, bin) — per-bin ranking over input
    // rows; the group-wide windows (cumulative predecessors + group total,
    // possibly collapsed into one Window node) consume the AGGREGATED
    // bin-count frame (child contains the groupBy), never raw rows.
    val (intraW, grpW) = windows.partition(_.partitionSpec.size == 2)
    assert(intraW.size === 1, plan.toString)
    assert(grpW.nonEmpty && grpW.forall(_.partitionSpec.size == 1), plan.toString)
    assert(grpW.forall(_.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty), "every group-wide window must run over the bin-count aggregate")
  }
}
