package graft

import graft.operators.RangeJoin
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("pairs points with all containing intervals of the same key, inclusive bounds") {
    val points = Seq((1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 99L, "p99"), (2L, 5L, "x5"))
      .toDF("k", "pt", "pname")
    val intervals = Seq((1L, 0L, 10L, "i1"), (1L, 10L, 20L, "i2"), (2L, 90L, 95L, "i3"))
      .toDF("k", "lo", "hi", "iname")
    val out = RangeJoin.pointInInterval(points, intervals, "k", "pt", "lo", "hi", bucketWidth = 7)
      .select("pname", "iname").as[(String, String)].collect().toSet
    assert(out === Set(("p5", "i1"), ("p10", "i1"), ("p10", "i2")))
  }

  test("no duplicate pairs when an interval spans many buckets") {
    val points = Seq((1L, 500L, "p")).toDF("k", "pt", "pname")
    val intervals = Seq((1L, 0L, 1000L, "wide")).toDF("k", "lo", "hi", "iname")
    val out = RangeJoin.pointInInterval(points, intervals, "k", "pt", "lo", "hi", bucketWidth = 10)
    assert(out.count() === 1)
  }

  test("nano-scale values bucket exactly (beyond double precision)") {
    val base = 1700000000L * 1000000000L
    val points = Seq((1L, base + 1L, "p")).toDF("k", "pt", "pname")
    val intervals = Seq((1L, base, base + 2L, "i")).toDF("k", "lo", "hi", "iname")
    val out = RangeJoin.pointInInterval(points, intervals, "k", "pt", "lo", "hi",
      bucketWidth = 1800000000000L)
    assert(out.count() === 1)
  }

  test("no nested-loop join in the plan") {
    val points = Seq((1L, 5L)).toDF("k", "pt")
    val intervals = Seq((1L, 0L, 10L)).toDF("k", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, intervals, "k", "pt", "lo", "hi", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
