package graft

import graft.functions.{Cdc, Stats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcStatsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("compactLog: latest version per key wins, ties broken by payload") {
    val log = Seq(
      ("k1", 1L, "a"), ("k1", 3L, "c"), ("k1", 2L, "b"),
      ("k2", 5L, "x"),
      // version tie on k3 — greater payload must win, deterministically
      ("k3", 7L, "p"), ("k3", 7L, "q")
    ).toDF("key", "ver", "payload")
    val out = Cdc.compactLog(log, Seq("key"), Seq("ver"), Seq("payload"))
      .orderBy("key").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq ===
      Seq(("k1", 3L, "c", 3L), ("k2", 5L, "x", 1L), ("k3", 7L, "q", 2L)))
  }

  test("compactLog: invariant under repartitioning (arrival order never decides)") {
    val log = (1 to 500).map(i => (s"k${i % 7}", (i * 13 % 101).toLong, s"p$i"))
      .toDF("key", "ver", "payload")
    val a = Cdc.compactLog(log, Seq("key"), Seq("ver"), Seq("payload")).orderBy("key").collect().toSeq
    val b = Cdc.compactLog(log.repartition(17), Seq("key"), Seq("ver"), Seq("payload"))
      .orderBy("key").collect().toSeq
    assert(a === b)
  }

  test("snapshotDiff: classifies I/U/D, drops unchanged, null-safe compare") {
    val old = Seq(
      (1L, Some(10.0), "A"),   // unchanged
      (2L, Some(20.0), "B"),   // updated balance
      (3L, None: Option[Double], "C"), // all-NULL compare val updated -> U (not I)
      (4L, Some(40.0), "D")    // deleted
    ).toDF("k", "bal", "seg")
    val nw = Seq(
      (1L, Some(10.0), "A"),
      (2L, Some(25.0), "B"),
      (3L, Some(30.0), "C"),
      (5L, Some(50.0), "E")    // inserted
    ).toDF("k", "bal", "seg")
    val out = Cdc.snapshotDiff(old, nw, Seq("k"), Seq("bal", "seg"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "U"), (3L, "U"), (4L, "D"), (5L, "I")))
    // old/new values carried for audit
    val u2 = out.find(_.getLong(0) == 2L).get
    assert(u2.getDouble(2) === 20.0 && u2.getDouble(3) === 25.0)
  }

  test("corrMatrix: exact result on a known dataset, invariant under repartitioning") {
    // y = 2x exactly -> corr 1.0; z anti-correlated with x -> corr -1.0
    val df = (1 to 100).map(i => (i.toLong, 2L * i, 101L - i)).toDF("x", "y", "z")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.corrMatrix(d, Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
        .orderBy("col_x", "col_y").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    val a = run(df)
    assert(a.map(t => (t._1, t._2)) === Seq(("x", "y"), ("x", "z"), ("y", "z")))
    // within one ulp of the algebraic ±1 (sqrt rounds once)
    assert(math.abs(a(0)._3 - 1.0) < 1e-15 && math.abs(a(1)._3 + 1.0) < 1e-15)
    // integer moments make the double BITS partition-independent
    assert(a === run(df.repartition(13)))
  }

  test("olsFit: recovers slope/intercept of an exact line per group") {
    // group g1: y = 3x + 7 (fixed-point shift 0); g2: y = -2x + 100
    val rows = (1 to 50).map(i => ("g1", i.toLong, 3L * i + 7)) ++
      (1 to 50).map(i => ("g2", i.toLong, -2L * i + 100))
    val df = rows.toDF("g", "x", "y")
    val out = Stats.olsFit(df, "g", col("x"), col("y"), yShift = 0)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(out === Seq(("g1", 50L, 3.0, 7.0), ("g2", 50L, -2.0, 100.0)))
  }

  test("olsFit: yShift divides back out exactly (exponent shift)") {
    // y = 0.5x encoded as fixed-point with shift 20: yFp = x * 2^19
    val df = (1 to 40).map(i => ("g", i.toLong, i.toLong << 19)).toDF("g", "x", "yfp")
    val out = Stats.olsFit(df, "g", col("x"), col("yfp")).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(2) === 0.5 && out.head.getDouble(3) === 0.0)
  }
}
