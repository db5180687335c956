package graft

import graft.functions.{Sketches, TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("CMS: estimate >= exact always; exact when the table is collision-free") {
    val words = (1 to 50).flatMap(i => Seq.fill(i)(s"w$i"))
    val toks = words.toDF("word")
    val exact = toks.groupBy(col("word")).agg(count(lit(1)).as("n_exact"))
    // Wide table: 50 distinct words over 4 x 4096 cells — collisions in
    // ALL 4 rows simultaneously are (50/4096)^4-rare, so min == exact.
    val wide = Sketches.cmsEstimate(
      Sketches.countMinTable(toks, "word", 4, 4096), exact, "word", 4, 4096)
      .select(col("word"), col("n_exact"), col("n_est"))
      .as[(String, Long, Long)].collect()
    assert(wide.length === 50)
    assert(wide.forall { case (_, ex, est) => est === ex }, wide.mkString(","))
    // Tiny table (width 4): heavy collisions — the one-sided guarantee
    // est >= exact must still hold for every word.
    val tight = Sketches.cmsEstimate(
      Sketches.countMinTable(toks, "word", 2, 4), exact, "word", 2, 4)
      .select(col("n_exact"), col("n_est")).as[(Long, Long)].collect()
    assert(tight.forall { case (ex, est) => est >= ex })
    assert(tight.exists { case (ex, est) => est > ex }, "width 4 must collide")
  }

  test("CMS: two partial sketches merged by cell-sum == one full build") {
    val a = (1 to 200).map(i => s"w${i % 13}").toDF("word")
    val b = (1 to 150).map(i => s"w${i % 7}").toDF("word")
    val merged = Sketches.countMinTable(a, "word", 4, 256)
      .union(Sketches.countMinTable(b, "word", 4, 256))
      .groupBy(col("r"), col("b")).agg(sum(col("c")).as("c"))
    val full = Sketches.countMinTable(a.union(b), "word", 4, 256)
    assert(merged.as[(Int, Long, Long)].collect().toSet ===
      full.as[(Int, Long, Long)].collect().toSet)
  }

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

  test("KMV runs as a streaming aggregation with exact batch parity") {
    // The bounded sorted-array buffer is a mergeable aggregation state, so
    // the SAME kmvDistinct column works as a stateful streaming aggregate
    // (complete mode) — per-key sketch state is k longs, not the value
    // set. Parity must be exact, not approximate: identical inputs fold
    // through identical merges.
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val b1 = (1 to 300).map(i => ("g" + (i % 2), s"u${i % 97}"))
    val b2 = (1 to 200).map(i => ("g" + (i % 2), s"v${i % 53}"))
    val in = MemoryStream[(String, String)]
    val out = in.toDF().toDF("g", "u")
      .groupBy(col("g"))
      .agg(Sketches.kmvDistinct(TF.xhash32(col("u")), 64).as("est"))
    val q = out.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kmv_stream").as[(String, Double)].collect().toMap
    val batch = (b1 ++ b2).toDF("g", "u")
      .groupBy(col("g"))
      .agg(Sketches.kmvDistinct(TF.xhash32(col("u")), 64).as("est"))
      .as[(String, Double)].collect().toMap
    assert(streamed === batch)
  }

  /** Scalar HLL reference sharing only the hash kernel: same bucket/rho
    * derivation and the same exact dyadic estimate arithmetic, computed
    * over plain Scala collections. */
  private def hllRef(keys: Seq[String], m: Int, salt: String): (Long, Double) = {
    val b = java.lang.Integer.numberOfTrailingZeros(m)
    val w = 32 - b
    val regs = keys.map { k =>
      val h = graft.expressions.TextKernels.xhash32(
        org.apache.spark.unsafe.types.UTF8String.fromString(salt + k))
      val bucket = h % m
      val rest = h / m
      val rho = if (rest == 0) w + 1 else w - (63 - java.lang.Long.numberOfLeadingZeros(rest))
      bucket -> rho.toLong
    }.groupBy(_._1).map { case (bk, rs) => bk -> rs.map(_._2).max }
    val nEmpty = m - regs.size
    val z = regs.values.map(r => 1.0 / (1L << r)).sum + nEmpty.toDouble
    val est = (0.7213 / (1.0 + 1.079 / m.toDouble)) * m.toDouble * m.toDouble / z
    (nEmpty.toLong, est)
  }

  test("HLL: registers and estimate match the scalar reference, per group") {
    val rows = (1 to 700).map(i => ("g" + (i % 3), "user" + (i % 250)))
    val out = Sketches.hllDistinct(
        rows.toDF("g", "u"), col("u"), Seq("g"), m = 64, salt = "hll")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> hllRef(rs.map(_._2).distinct, 64, "hll")
    }
    assert(out === expected)
  }

  test("HLL: estimate lands near the true cardinality; invariant to partitioning") {
    val n = 2000
    val df = (1 to n).map(i => ((i % 7).toLong, s"k$i")).toDF("g", "u")
    val est = Sketches.hllDistinct(df, col("u"), Seq("g"), m = 64, salt = "s")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val truth = (1 to n).map(i => (i % 7).toLong).groupBy(identity).map {
      case (g, xs) => g -> xs.size
    }
    for ((g, t) <- truth) {
      val e = est(g)
      // m = 64 -> stderr ~13%; 30% is a deterministic-fixture bound
      // (~285 distinct/group = ~4.5 per register, the raw-HLL regime).
      assert(math.abs(e - t) < 0.30 * t, s"group $g: est $e vs true $t")
    }
    val re = Sketches.hllDistinct(df.repartition(17), col("u"), Seq("g"), m = 64, salt = "s")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(re === est, "register max-merge must make the estimate partition-invariant")
  }

  test("HLL store: increments merge on read; OVERLAPPING slices cannot inflate") {
    val rows = (1 to 900).map(i => ("d" + (i % 4), "u" + (i % 300)))
    val df = rows.toDF("g", "u")
    val s1 = df.filter(col("u").substr(2, 1).isin("1", "2", "3", "4"))
    val s2 = df // full corpus: overlaps slice 1 entirely
    val dir = java.nio.file.Files.createTempDirectory("hll_inc").toString
    Sketches.writeHllRegisters(s1, col("u"), Seq("g"), dir, m = 64, salt = "h")
    Sketches.appendHllRegisters(s2, col("u"), Seq("g"), dir, m = 64, salt = "h")
    def rows3(d: org.apache.spark.sql.DataFrame) =
      d.as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val stored = rows3(Sketches.readHllEstimate(spark, dir, Seq("g"), m = 64))
    val batch = rows3(Sketches.hllDistinct(df, col("u"), Seq("g"), m = 64, salt = "h"))
    // Max-merge idempotence: re-sketching already-stored keys is a no-op,
    // so store == one batch sketch of the union despite the full overlap.
    assert(stored === batch)
  }
}
