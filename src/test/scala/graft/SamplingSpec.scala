package graft

import graft.functions.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ids = (1 to 2000).map(_.toString).toDF("k")

  test("bernoulli: deterministic under repartitioning, rate approximately honored") {
    val picked = ids.filter(Sampling.bernoulli(col("k"), 0.3, "t")).as[String].collect().toSet
    val repicked = ids.repartition(13)
      .filter(Sampling.bernoulli(col("k"), 0.3, "t")).as[String].collect().toSet
    assert(picked === repicked)
    assert(math.abs(picked.size / 2000.0 - 0.3) < 0.05)
    // A different salt draws an (almost surely) different sample.
    val other = ids.filter(Sampling.bernoulli(col("k"), 0.3, "u")).as[String].collect().toSet
    assert(other !== picked)
  }

  test("hashRange: disjoint ranges give provably disjoint, exhaustive splits") {
    val train = ids.filter(Sampling.hashRange(col("k"), 0.0, 0.8, "sp")).as[String].collect().toSet
    val valid = ids.filter(Sampling.hashRange(col("k"), 0.8, 0.9, "sp")).as[String].collect().toSet
    val test_ = ids.filter(Sampling.hashRange(col("k"), 0.9, 1.0, "sp")).as[String].collect().toSet
    assert((train & valid).isEmpty && (train & test_).isEmpty && (valid & test_).isEmpty)
    assert(train.size + valid.size + test_.size === 2000)
  }

  test("shards: complete, dense per-shard positions, deterministic under repartitioning") {
    val out = Sampling.shards(ids, col("k"), nShards = 4, salt = "sh")
      .select(col("k"), col("shard"), col("shard_pos"))
      .as[(String, Long, Int)].collect()
    assert(out.length === 2000)
    assert(out.map(_._2).toSet === Set(0L, 1L, 2L, 3L))
    // Positions are exactly 0..count-1 within every shard (a true
    // permutation of each shard's rows).
    for ((shard, rows) <- out.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq === (0 until rows.length), s"shard $shard")
    // Pure function of the data: identical under repartitioning.
    val again = Sampling.shards(ids.repartition(13), col("k"), 4, "sh")
      .select(col("k"), col("shard"), col("shard_pos"))
      .as[(String, Long, Int)].collect()
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  /** Reference xhash32: unsigned value of the first 8 hex chars of md5 —
    * must equal TextFunctions.xhash32 (and the DuckDB oracle's form). */
  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  test("temperatureMix: bit-exact vs a scalar replica of the rate formula") {
    // Skew: stratum A 1000 rows, B 100. tau=0.5 flattening should keep all
    // of B (rate caps at 1) and downsample A.
    val rows = (1 to 1000).map(i => ("A", s"a$i")) ++ (1 to 100).map(i => ("B", s"b$i"))
    val df = rows.toDF("g", "k")
    val got = Sampling.temperatureMix(df, "g", col("k"), targetFrac = 0.5, salt = "tm")
      .select("g", "k").as[(String, String)].collect().toSet
    // Scalar replica — same fixed-point weights, same parenthesization.
    val n = Map("A" -> 1000L, "B" -> 100L)
    val w = n.map { case (g, c) => g -> math.floor(math.sqrt(c.toDouble) * 1048576.0).toLong }
    val s = w.values.sum.toDouble
    val tot = n.values.sum.toDouble
    val thr = n.keys.map { g =>
      g -> math.min(4294967296L,
        math.floor(tot * 0.5 * w(g).toDouble / (s * n(g).toDouble) * 4294967296.0).toLong)
    }.toMap
    val want = rows.filter { case (g, k) => refHash("tm" + k) < thr(g) }.toSet
    assert(got === want)
    assert(thr("B") === 4294967296L, "rare stratum caps at keep-everything")
    val keptA = got.count(_._1 == "A")
    assert(got.count(_._1 == "B") === 100)
    assert(keptA < 550 && keptA > 300, s"skewed stratum downsampled, got $keptA")
    // Deterministic under repartitioning.
    val again = Sampling.temperatureMix(df.repartition(11), "g", col("k"), 0.5, "tm")
      .select("g", "k").as[(String, String)].collect().toSet
    assert(again === got)
  }

  test("oversampleToParity: bit-exact vs a scalar replica; largest stratum untouched") {
    // A 900 / B 250: base_B = 3 with a 150/250 fractional draw; A emits
    // exactly one copy (base 1, remainder 0 -> threshold 0).
    val rows = (1 to 900).map(i => ("A", s"a$i")) ++ (1 to 250).map(i => ("B", s"b$i"))
    val df = rows.toDF("g", "k")
    val got = Sampling.oversampleToParity(df, "g", col("k"), "up2")
      .select("g", "k", "copy").as[(String, String, Long)].collect().toSet
    val n = Map("A" -> 900L, "B" -> 250L)
    val nmax = 900L
    val want = rows.flatMap { case (g, k) =>
      val base = nmax / n(g)
      val thr = math.floor((nmax % n(g)).toDouble / n(g).toDouble * 4294967296.0).toLong
      val copies = base + (if (refHash("up2" + k) < thr) 1L else 0L)
      (0L until copies).map(c => (g, k, c))
    }.toSet
    assert(got === want)
    assert(got.count(_._1 == "A") === 900, "largest stratum emits exactly one copy per row")
    val nB = got.count(_._1 == "B")
    assert(nB >= 750 && nB <= 1000, s"B lands between base and base+1 per row, got $nB")
    // Deterministic under repartitioning.
    val again = Sampling.oversampleToParity(df.repartition(9), "g", col("k"), "up2")
      .select("g", "k", "copy").as[(String, String, Long)].collect().toSet
    assert(again === got)
  }

  test("stratifiedQuota: exactly quota per stratum (or all, when smaller)") {
    val df = (1 to 300).map(i => (s"s${i % 3}", i.toString)).toDF("g", "k")
      .union(Seq(("tiny", "x")).toDF("g", "k"))
    val out = Sampling.stratifiedQuota(df, col("g"), col("k"), quota = 10, salt = "q")
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts("s0") === 10 && counts("s1") === 10 && counts("s2") === 10)
    assert(counts("tiny") === 1)
    // Deterministic under repartitioning.
    val again = Sampling.stratifiedQuota(df.repartition(7), col("g"), col("k"), 10, "q")
    assert(out.collect().toSet === again.collect().toSet)
  }

  test("weightedQuota: bit-exact vs a scalar replica of the min-of-w draw") {
    // Weights 1..4 cycle over the keys; the scalar replica recomputes every
    // row's min-of-w md5 draw and takes the quota per stratum by the same
    // (draw, key) order — the two-phase window must match it exactly.
    val rows = (1 to 400).map(i => (s"s${i % 2}", s"k$i", 1L + (i % 4)))
    val df = rows.toDF("g", "k", "w")
    val out = Sampling.weightedQuota(df, col("g"), col("k"), col("w"), quota = 20, salt = "wq")
      .select("g", "k", "w").as[(String, String, Long)].collect().toSet
    val expected = rows
      .map { case (g, k, w) =>
        (g, k, w, (0L until w).map(c => refHash(s"wq${k}_$c")).min)
      }
      .groupBy(_._1)
      .flatMap { case (_, rs) =>
        rs.sortBy { case (_, k, _, d) => (d, k) }.take(20)
      }
      .map { case (g, k, w, _) => (g, k, w) }
      .toSet
    assert(out === expected)
    // Deterministic under repartitioning.
    val again = Sampling.weightedQuota(
      df.repartition(7), col("g"), col("k"), col("w"), 20, "wq")
      .select("g", "k", "w").as[(String, String, Long)].collect().toSet
    assert(again === out)
  }

  test("weightedQuota: NULL and non-positive weights draw nothing (oracle join semantics)") {
    val df = Seq(("g", "a", Some(2L)), ("g", "b", None), ("g", "c", Some(0L)),
      ("g", "d", Some(-5L)), ("g", "e", Some(1L)))
      .toDF("g", "k", "w")
    val out = Sampling.weightedQuota(df, col("g"), col("k"), col("w"), quota = 10, salt = "wn")
      .select("k").as[String].collect().sorted
    // Only the two valid-weight rows can win; invalid rows never occupy
    // a slot (a NULL draw would otherwise sort NULLS FIRST and win).
    assert(out.toSeq === Seq("a", "e"))
  }

  test("weightedQuota: higher weights win proportionally more slots") {
    // Two strata of 500 keys each, half weight 1 and half weight 8:
    // pairwise P(w8 beats w1) = 8/9, so the top 100 should be dominated by
    // weight-8 rows (binomially, fewer than 40 weight-1 winners is ~certain).
    val rows = (1 to 1000).map(i => ("g", s"k$i", if (i % 2 == 0) 8L else 1L))
    val out = Sampling.weightedQuota(
      rows.toDF("g", "k", "w"), col("g"), col("k"), col("w"), quota = 100, salt = "wp")
      .select("w").as[Long].collect()
    assert(out.length === 100)
    assert(out.count(_ == 8L) > 60, s"weight-8 rows won only ${out.count(_ == 8L)}/100 slots")
  }

  test("weightedQuota: a weight above maxWeight raises a contract error, not an OOM") {
    // An un-capped upstream count (say a duplication tally of 10^9) would
    // otherwise materialize a billion-element draw array per row and kill
    // the task opaquely; the guard names the key and the bound instead.
    val df = Seq(("g", "a", 2L), ("g", "huge", 2000000000L)).toDF("g", "k", "w")
    val e = intercept[Exception] {
      Sampling.weightedQuota(df, col("g"), col("k"), col("w"), quota = 10, salt = "wg")
        .collect()
    }
    assert(e.getMessage.contains("maxWeight") ||
      Option(e.getCause).exists(_.getMessage.contains("maxWeight")))
    // A raised bound admits the same row.
    val ok = Sampling.weightedQuota(
      Seq(("g", "a", 1500L)).toDF("g", "k", "w"),
      col("g"), col("k"), col("w"), quota = 10, salt = "wg", maxWeight = 2048)
      .select("k").as[String].collect()
    assert(ok.toSeq === Seq("a"))
  }
}

class ClustersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("duplicateClusters: multi-hop chains collapse to one component") {
    // 1-2, 2-3, 3-4 chain + isolated pair 10-11: two components.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("i", "j")
    val out = graft.functions.Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("duplicateClusters: ring needs propagation in both directions") {
    val ring = Seq((5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L)).toDF("i", "j")
    val out = graft.functions.Dedup.duplicateClusters(ring)
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(5L))
    assert(out.keySet === Set(5L, 6L, 7L, 8L))
  }
}

class ClustersEdgeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  test("duplicateClusters: empty pair input yields an empty result, no error") {
    val empty = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(graft.functions.Dedup.duplicateClusters(empty).count() === 0)
  }
}
