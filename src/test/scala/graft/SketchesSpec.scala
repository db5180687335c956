package graft

import graft.functions.{Sketches, TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("KMV: exact below k, within expected error above k") {
    val small = (1 to 40).map(i => ("g", i.toLong)).toDF("g", "v")
    val exactSmall = small.groupBy(col("g"))
      .agg(Sketches.kmvDistinct(TF.xhash32(concat(lit("u"), col("v"))), 64).as("est"))
      .select(col("est")).as[Double].head()
    assert(exactSmall === 40.0) // below k: exact

    val big = (1 to 20000).map(i => ("g", i.toLong)).toDF("g", "v")
    val est = big.groupBy(col("g"))
      .agg(Sketches.kmvDistinct(TF.xhash32(concat(lit("u"), col("v"))), 64).as("est"))
      .select(col("est")).as[Double].head()
    // stderr ~ 1/sqrt(k-2) = 12.7%; 4 sigma bound.
    assert(math.abs(est - 20000) / 20000 < 0.51, s"estimate $est")
  }

  test("KMV skips NULL inputs (the SQL distinct-count convention)") {
    val df = Seq(Some(1L), Some(2L), None, Some(2L), None)
      .toDF("v")
    val est = df.agg(
      Sketches.kmvDistinct(TF.xhash32(concat(lit("u"), col("v"))), 64).as("est"))
      .select(col("est")).as[Double].head()
    assert(est === 2.0, "nulls must not count as a phantom distinct value")
  }

  test("KMV buffer stays bounded at k and dedups hashes") {
    val agg = new Sketches.KMVDistinct(8)
    val buf = (1 to 1000).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i % 100).toLong))
    assert(buf.size === 8)
    assert(buf === buf.distinct.sorted)
    val merged = agg.merge(buf, buf)
    assert(merged === buf) // idempotent merge
  }
}
