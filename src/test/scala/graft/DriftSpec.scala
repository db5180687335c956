package graft

import graft.functions.Drift
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chi-square epoch-drift semantics (cross-engine parity is dist_drift's
  * DuckDB oracle; here: identical vs shifted distributions and a
  * driver-side reference on random data). */
class DriftSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def frame(rows: Seq[(String, Long, Long)]) =
    rows.toDF("g", "e", "bin")

  private def drift(rows: Seq[(String, Long, Long)]) =
    Drift.chiSquareDrift(frame(rows), "g", col("e"), col("bin"))
      .select(col("g"), col("n_bins"), col("chi2"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("identical epoch distributions score (near) zero; a shift scores large") {
    val same = for (e <- 0L to 1L; b <- 1L to 5L; _ <- 1 to 10) yield ("s", e, b)
    // Epoch 1 moved all mass from bins 1-5 to bins 6-10.
    val moved = (for (b <- 1L to 5L; _ <- 1 to 10) yield ("m", 0L, b)) ++
      (for (b <- 6L to 10L; _ <- 1 to 10) yield ("m", 1L, b))
    val got = drift(same ++ moved)
    assert(got("s")._2 === 0.0) // exactly equal histograms: every e == n
    assert(got("m")._1 === 10L)
    assert(got("m")._2 > 50.0, s"full separation must dominate: ${got("m")}")
  }

  test("groups missing an epoch are dropped, not divided by zero") {
    val rows = Seq(("only0", 0L, 1L), ("only0", 0L, 2L), ("both", 0L, 1L), ("both", 1L, 1L))
    val got = drift(rows)
    assert(!got.contains("only0"))
    assert(got("both")._1 === 1L)
  }

  test("chiSquareBetweenHists == the epoch form on the same split") {
    val rows = (1 to 600).map { i =>
      ("g" + (i % 2), (i % 2 + i % 3).toLong /*epoch-skewed*/, (i % 7).toLong)
    }.map { case (g, e, b) => (g, e % 2, b) }
    val epochForm = drift(rows)
    val ref = Drift.histogram(
      frame(rows.filter(_._2 == 0L)).select(col("g"), col("bin")), "g", col("bin"))
    val cur = Drift.histogram(
      frame(rows.filter(_._2 == 1L)).select(col("g"), col("bin")), "g", col("bin"))
    val histForm = Drift.chiSquareBetweenHists(ref, cur, "g", "bin", "c")
      .select(col("g"), col("n_bins"), col("chi2"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(histForm === epochForm)
  }

  test("driftStream: per-batch chi-square against a persisted reference histogram") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Reference: uniform bins 0..4 per group.
    val refRows = for (g <- Seq("a", "b"); b <- 0L to 4L; _ <- 1 to 20) yield (g, b)
    val ref = Drift.histogram(refRows.toDF("g", "bin"), "g", col("bin"))
    val in = MemoryStream[(String, Long)]
    val got = scala.collection.mutable.Map[Long, Map[String, (Long, Double)]]()
    val q = Drift.driftStream(in.toDF.toDF("g", "v"), ref, "g", col("v"))({ (df, id) =>
      got(id) = df.select(col("g"), col("n_bins"), col("chi2"))
        .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    }).start()
    // Batch 0: same shape as the reference (scaled) -> chi2 == 0 exactly.
    in.addData((for (g <- Seq("a", "b"); b <- 0L to 4L; _ <- 1 to 4) yield (g, b)): _*)
    q.processAllAvailable()
    // Batch 1: all of group a's mass lands in one novel bin -> large chi2.
    in.addData((1 to 20).map(_ => ("a", 9L)): _*)
    q.processAllAvailable()
    q.stop()
    assert(got(0L)("a")._2 === 0.0 && got(0L)("b")._2 === 0.0)
    assert(got(1L)("a")._1 === 6L) // 5 reference bins + the novel one
    assert(got(1L)("a")._2 > 30.0, got(1L).toString)
    assert(!got(1L).contains("b"), "group absent from the batch is not scored")
  }

  test("emb stats store: incremental reference + stream face equal the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(21)
    def vecs(ids: Range, shift: Float) = ids.map { i =>
      (i.toLong, Array.fill(4)((rnd.nextInt(1000) - 500) / 256.0f + shift))
    }
    val refA = vecs(0 until 120, 0f)
    val cur = vecs(1000 until 1100, 0.25f)
    // Reference accumulates in two DISJOINT slices (the additive store).
    val dir = java.nio.file.Files.createTempDirectory("emb_stats").toString + "/ref"
    val (r1, r2) = refA.splitAt(60)
    Drift.writeEmbStats(r1.toDF("vec_id", "embedding"), "embedding", dir)
    Drift.appendEmbStats(r2.toDF("vec_id", "embedding"), "embedding", dir)
    val refStats = Drift.readEmbStats(spark, dir)
    // Batch parity: between(storedRef, cur) == embeddingDrift on the
    // slice-tagged union of the same rows.
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val viaStore = key(Drift.embeddingDriftBetween(
      refStats, Drift.embStats(cur.toDF("vec_id", "embedding"), "embedding")))
    val tagged = refA.map(v => (v._1, v._2, "a")) ++ cur.map(v => (v._1, v._2, "b"))
    val direct = key(Drift.embeddingDrift(
      tagged.toDF("vec_id", "embedding", "slice"), col("slice"), "embedding"))
    assert(viaStore === direct)
    // The planted +0.25 shift is visible on every dimension.
    assert(viaStore.values.forall(_._5 < -0.1), viaStore.toString)
    // Stream face: per-batch drift against the stored reference equals
    // the batch operator on that batch's rows.
    val in = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.Map[Long, Map[Int, (Long, Long, Double, Double, Double)]]()
    val q = Drift.embDriftStream(
        in.toDF.toDF("vec_id", "embedding"), refStats, "embedding")({ (df, id) =>
      got(id) = key(df)
    }).start()
    val (c1, c2) = cur.map(v => (v._1, v._2.toSeq)).splitAt(50)
    in.addData(c1); q.processAllAvailable()
    in.addData(c2); q.processAllAvailable()
    q.stop()
    val b0 = key(Drift.embeddingDriftBetween(
      refStats, Drift.embStats(c1.toDF("vec_id", "embedding"), "embedding")))
    assert(got(0L) === b0)
    assert(got.contains(1L) && got(1L).nonEmpty)
  }

  test("emb stats batch-id ledger: a replayed tagged slice cannot double-count") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    def vecs(ids: Range) = ids.map { i =>
      (i.toLong, Array.fill(3)((rnd.nextInt(1000) - 500) / 256.0f))
    }
    val (b7, b8) = (vecs(0 until 40), vecs(100 until 160))
    val dir = java.nio.file.Files.createTempDirectory("emb_ledger").toString + "/ref"
    Drift.appendEmbStats(b7.toDF("vec_id", "embedding"), "embedding", dir, batchId = 7L)
    Drift.appendEmbStats(b7.toDF("vec_id", "embedding"), "embedding", dir, batchId = 7L) // replay
    Drift.appendEmbStats(b8.toDF("vec_id", "embedding"), "embedding", dir, batchId = 8L)
    def stats(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ledger = stats(Drift.readEmbStats(spark, dir))
    val direct = stats(Drift.embStats(
      (b7 ++ b8).toDF("vec_id", "embedding"), "embedding"))
    assert(ledger === direct, "replayed batch 7 must collapse in the ledger")
    // Sanity: the counts reflect ONE copy of batch 7 (40 + 60 rows/dim).
    assert(ledger.values.forall(_._1 == 100L), ledger.toString)
  }

  test("property: matches a driver-side chi-square (same fixed-point fold) on random data") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 3000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val e = rnd.nextInt(2).toLong
      // Epoch-dependent bin distribution => nonzero drift.
      val bin = (rnd.nextInt(8) + (if (e == 1L) rnd.nextInt(3) else 0)).toLong
      (g, e, bin)
    }
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val bins = rs.map(_._3).distinct.sorted
      val na = bins.map(b => rs.count(r => r._2 == 0L && r._3 == b).toLong)
      val nb = bins.map(b => rs.count(r => r._2 == 1L && r._3 == b).toLong)
      val (ta, tb) = (na.sum, nb.sum)
      val cfp = bins.indices.map { i =>
        val g2 = (ta + tb).toDouble
        val ea = (na(i) + nb(i)).toDouble * ta.toDouble / g2
        val eb = (na(i) + nb(i)).toDouble * tb.toDouble / g2
        math.floor(((na(i) - ea) * (na(i) - ea) / ea +
          (nb(i) - eb) * (nb(i) - eb) / eb) * 1048576.0).toLong
      }.sum
      g -> ((bins.size.toLong, cfp / 1048576.0))
    }
    assert(drift(rows) === expected)
  }

  test("embeddingDrift: matches a driver-side fixed-point fold; partitioning-invariant") {
    import graft.functions.Drift
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 6
    val rows = (0 until 400).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextInt(2000) - 1000) / 512.0f))
    }
    def slice(id: Long) = if (id % 2 == 0) "a" else "b"
    // Driver-side reference: the SAME 2^-20 floor and one division, in a
    // deliberately different shape (a scalar fold per (slice, dim)).
    val expected = (0 until dim).map { d =>
      def mu(s: String) = {
        val fps = rows.filter(r => slice(r._1) == s)
          .map(r => math.floor(r._2(d).toDouble * 1048576.0).toLong)
        (fps.size.toLong, fps.sum.toDouble / (fps.size * 1048576L).toDouble)
      }
      val ((na, mua), (nb, mub)) = (mu("a"), mu("b"))
      d -> ((na, nb, mua, mub, mua - mub))
    }.toMap
    for (parts <- Seq(1, 7)) {
      val got = Drift.embeddingDrift(
          rows.toDF("vec_id", "embedding").repartition(parts),
          when(col("vec_id") % 2 === 0, lit("a")).otherwise(lit("b")),
          "embedding")
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5)))).toMap
      assert(got === expected, s"parts=$parts")
    }
  }
}
