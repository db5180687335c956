package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def left = Seq(
    (1L, 100L, "e1"), (1L, 200L, "e2"), (1L, 50L, "e0"),
    (2L, 100L, "e3")).toDF("k", "ts", "name")

  private def right = Seq(
    (1L, 100L, 10.0), (1L, 150L, 20.0), (3L, 1L, 99.0)).toDF("k", "ts", "v")

  test("matches the latest right row with rightTs <= leftTs; equal ts matches") {
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", "ts",
      Map("ts" -> "rts", "v" -> "rv"))
      .as[(Long, Long, String, Option[Long], Option[Double])].collect().toSet
    assert(out === Set(
      (1L, 50L, "e0", None, None),           // before any right row
      (1L, 100L, "e1", Some(100L), Some(10.0)), // equal ts matches
      (1L, 200L, "e2", Some(150L), Some(20.0)), // latest prior
      (2L, 100L, "e3", None, None)))         // key with no right rows
  }

  test("forward: matches the nearest FOLLOWING right row; equal ts matches") {
    val out = AsOfJoin.asofJoinForward(left, right, "k", "ts", "ts",
      Map("ts" -> "rts", "v" -> "rv"))
      .as[(Long, Long, String, Option[Long], Option[Double])].collect().toSet
    assert(out === Set(
      (1L, 50L, "e0", Some(100L), Some(10.0)),  // nearest following, not 150
      (1L, 100L, "e1", Some(100L), Some(10.0)), // equal ts matches
      (1L, 200L, "e2", None, None),             // after every right row
      (2L, 100L, "e3", None, None)))            // key with no right rows
  }

  test("NULL timestamps never match in either direction") {
    val l = Seq((1L, Some(100L), "e1"), (1L, None, "eNull")).toDF("k", "ts", "name")
    val r = Seq((1L, Some(150L), 20.0), (1L, Option.empty[Long], 99.0)).toDF("k", "ts", "v")
    val fwd = AsOfJoin.asofJoinForward(l, r, "k", "ts", "ts", Map("v" -> "rv"))
      .as[(Long, Option[Long], String, Option[Double])].collect().toSet
    // The null-ts left row gets NO match (desc_nulls_first), and the
    // null-ts right row is dropped rather than carried to everyone.
    assert(fwd === Set(
      (1L, Some(100L), "e1", Some(20.0)),
      (1L, None, "eNull", None)))
    val bwd = AsOfJoin.asofJoin(l, r, "k", "ts", "ts", Map("v" -> "rv"))
      .as[(Long, Option[Long], String, Option[Double])].collect().toSet
    assert(bwd === Set(
      (1L, Some(100L), "e1", None),
      (1L, None, "eNull", None)))
  }

  test("plans exactly one shuffle (the key window)") {
    val plan = AsOfJoin.asofJoin(left, right, "k", "ts", "ts", Map("v" -> "rv"))
      .queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(shuffles === 1, plan)
  }
}
