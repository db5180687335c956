package graft

import graft.functions.{Similarity, TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized property coverage for the round-8 kernels. Each property
 * pits the distributed implementation against a deliberately different
 * driver-side reference (a direct fold / brute-force argmin), on random
 * inputs under random partitioning, so a shared systematic bug can't
 * cancel out:
 *
 *  - `bpeApplyMerges` (the greedy merge kernel) vs a per-rule scan fold —
 *    low-alphabet token streams make self-pair runs (the run-parity edge
 *    the oracle SQL also has to get right) and rule-chaining frequent;
 *  - merge LEARNING determinism: the top-n table is a pure function of
 *    the corpus, stable under repartitioning;
 *  - `pqEncode`/`pqReconstruct` vs brute-force L2 argmin + concatenation
 *    on random float vectors (including ties-by-construction corners like
 *    all-zero and constant vectors).
 */
class TokenizerPropertySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // ---- BPE ----

  private def refApply(tk: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(tk) { case (cur, (a, b)) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < cur.length) {
        if (i + 1 < cur.length && cur(i) == a && cur(i + 1) == b) { out += (a + b); i += 2 }
        else { out += cur(i); i += 1 }
      }
      out.toSeq
    }

  // Alphabet of TWO symbols: adjacent repeats (self-pair runs) and deep
  // rule chaining are the norm, not the exception.
  private val docsGen: Gen[Seq[Seq[String]]] = for {
    nDocs <- Gen.chooseNum(1, 12)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.chooseNum(0, 30)
      ts <- Gen.listOfN(len, Gen.oneOf("a", "b"))
    } yield ts)
  } yield docs

  private val mergesGen: Gen[Seq[(String, String)]] = for {
    n <- Gen.chooseNum(0, 6)
    ms <- Gen.listOfN(n, for {
      a <- Gen.oneOf("a", "b", "ab", "ba", "aa", "bb")
      b <- Gen.oneOf("a", "b", "ab", "ba", "aa", "bb")
    } yield (a, b))
  } yield ms

  test("bpeApply kernel equals the greedy reference on random low-alphabet streams") {
    for (i <- 0 until 30) {
      val seed = rng.Seed(9000L + i)
      val docs = docsGen(Gen.Parameters.default, seed).get
      val merges = mergesGen(Gen.Parameters.default, rng.Seed(7000L + i)).get
      val got = docs.zipWithIndex.map { case (d, j) => (j.toLong, d) }
        .toDF("id", "tk")
        .repartition(1 + (i % 5))
        .select(col("id"), TF.bpeApply(col("tk"), merges).as("m"))
        .as[(Long, Seq[String])].collect().toMap
      for ((d, j) <- docs.zipWithIndex)
        assert(got(j.toLong) == refApply(d, merges),
          s"case $i doc $j: tokens=$d merges=$merges")
    }
  }

  test("learnBpeMerges is a pure function of the corpus under repartitioning") {
    for (i <- 0 until 5) {
      val docs = docsGen(Gen.Parameters.default, rng.Seed(400L + i)).get
        .map(_.mkString(" "))
      val df = docs.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val base = TF.learnBpeMerges(df, col("text"), n = 5)
      assert(base == TF.learnBpeMerges(df.repartition(7), col("text"), n = 5), s"case $i")
      // Rank order really is (count DESC, pair ASC): recompute driver-side.
      val pairs = docs.flatMap { t =>
        val tk = t.split(" ").filter(_.nonEmpty).toSeq
        tk.zip(tk.drop(1))
      }
      val expect = pairs.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.map(_._1).take(5)
      assert(base == expect, s"case $i: $docs")
    }
  }

  /** Driver-side reference for ITERATIVE BPE: round r's rule is the top
    * pair (count DESC, pair ASC) of the corpus with rules 1..r-1 applied
    * greedily. Returns as many rules as the corpus sustains, up to max. */
  private def refTrain(
      docs: Seq[Seq[String]], max: Int): Seq[(String, String, Long)] = {
    var cur = docs
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    while (r < max) {
      val counts = cur.flatMap(d => d.zip(d.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      if (counts.isEmpty) return out.toSeq
      val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      out += ((a, b, n))
      cur = cur.map(refApply(_, Seq((a, b))))
      r += 1
    }
    out.toSeq
  }

  test("learnBpeMergesChained equals the iterative driver-side reference") {
    for (i <- 0 until 10) {
      val docs = docsGen(Gen.Parameters.default, rng.Seed(600L + i)).get
      val expect = refTrain(docs, max = 3)
      if (expect.nonEmpty) {
        val df = docs.zipWithIndex
          .map { case (d, j) => (j.toLong, d.mkString(" ")) }
          .toDF("doc_id", "text")
          .repartition(1 + (i % 5))
        val got = TF.learnBpeMergesChained(df, col("text"), rounds = expect.size)
        assert(got == expect, s"case $i: $docs")
      }
    }
  }

  test("iterative training provably diverges from the one-shot table") {
    // After rule 1 merges (x, y), the one-shot table's rank-2 pair (y, z)
    // no longer exists in the corpus — true BPE learns (xy, z) instead.
    val df = Seq.fill(5)("x y z").zipWithIndex
      .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
    val oneShot = TF.learnBpeMerges(df, col("text"), n = 2)
    val chained = TF.learnBpeMergesChained(df, col("text"), rounds = 2)
    assert(oneShot == Seq(("x", "y"), ("y", "z")))
    assert(chained.map(m => (m._1, m._2)) == Seq(("x", "y"), ("xy", "z")))
    assert(chained(1)._3 == 5L)
  }

  test("bpeEncodeIds/bpeDecodeIds: decode(encode) == source with OOV -> <unk>, exactly") {
    // Random token streams over a 6-word alphabet; vocab covers only 3 of
    // them, so the round-trip restores in-vocab tokens verbatim and maps
    // every OOV position to the sentinel — the bpe_decode contract.
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val vocab = Map("aa" -> 0, "bb" -> 1, "cc" -> 2)
    val unk = vocab.size
    val docs = (0 until 30).map { i =>
      val n = 1 + (i * 7) % 12
      (i.toLong, (0 until n).map(j => words((i * 31 + j * 17) % words.size)))
    }
    val got = docs.toDF("id", "tk")
      .repartition(3)
      .select(col("id"),
        TF.bpeDecodeIds(TF.bpeEncodeIds(col("tk"), vocab, unk), vocab).as("dtk"),
        TF.bpeEncodeIds(col("tk"), vocab, unk).as("ids"))
      .as[(Long, Seq[String], Seq[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for ((id, tk) <- docs) {
      val (dtk, ids) = got(id)
      assert(ids == tk.map(t => vocab.getOrElse(t, unk)), s"doc $id ids")
      assert(dtk == tk.map(t => if (vocab.contains(t)) t else "<unk>"), s"doc $id round-trip")
    }
  }

  test("BPE at realistic vocab scale: 4096 merges + 8192-entry vocab stay codegen-safe") {
    // The scale caveat under test: bpeEncodeIds/bpeDecodeIds carry the
    // vocab as a typedLit map and BpeApply carries its merge table via
    // addReferenceObj — both are REFERENCES in generated code (never
    // inlined constants), so neither the 64KB method limit nor the
    // constant pool caps them. This exercises both at tokenizer-realistic
    // sizes; a regression to constant inlining would throw in codegen
    // here long before production vocab sizes.
    val vocab = (0 until 8192).map(i => s"tok$i" -> i).toMap
    val unk = vocab.size
    val merges = (0 until 4096).map(i => (s"tok${i * 2}", s"tok${i * 2 + 1}"))
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 60).map { j =>
        if (j % 11 == 0) s"oov$j" else s"tok${(i * 131 + j * 7919) % 8192}"
      })
    }
    val enc = TF.bpeEncodeIds(col("tk"), vocab, unk)
    val got = docs.toDF("id", "tk")
      .repartition(4)
      .select(col("id"),
        enc.as("ids"),
        TF.bpeDecodeIds(enc, vocab).as("dtk"),
        TF.bpeApply(col("tk"), merges).as("merged"))
      .as[(Long, Seq[Int], Seq[String], Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for ((id, tk) <- docs) {
      val (ids, dtk, merged) = got(id)
      assert(ids == tk.map(t => vocab.getOrElse(t, unk)), s"doc $id ids")
      assert(dtk == tk.map(t => if (vocab.contains(t)) t else "<unk>"),
        s"doc $id round-trip")
      assert(merged == refApply(tk, merges), s"doc $id merge parity at 4096 rules")
    }
    // The broadcast-vocab face (BpeEncodeBcast — the >64k posture where
    // the table ships once per executor instead of riding every task
    // closure) must be value-identical to the literal-map encode at the
    // same vocab scale, including OOV and null handling.
    val bgot = docs.toDF("id", "tk")
      .repartition(4)
      .select(col("id"), TF.bpeEncodeIdsBcast(spark, col("tk"), vocab, unk).as("ids"))
      .as[(Long, Seq[Int])].collect().toMap
    for ((id, tk) <- docs)
      assert(bgot(id) == tk.map(t => vocab.getOrElse(t, unk)),
        s"doc $id broadcast-encode parity")
  }

  // ---- PQ ----

  private val vecGen: Gen[Seq[Float]] = Gen.oneOf(
    Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 16.0f)),
    Gen.const(List.fill(8)(0.0f)), // all-zero: every codeword ties on -2<s,c>+|c|2? no — dist=|c|2, unique min
    Gen.const(List.fill(8)(1.0f)))

  test("pqEncode/pqReconstruct equal the brute-force argmin on random vectors") {
    val cb = Similarity.pqCodebook(numSub = 2, codesPerSub = 8, subDim = 4)
    val vecs = (0 until 40).map(i => vecGen(Gen.Parameters.default, rng.Seed(50L + i)).get)
    val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .repartition(3)
      .select(col("id"), Similarity.pqEncode(col("v"), cb, 4).as("codes"),
        Similarity.pqReconstruct(Similarity.pqEncode(col("v"), cb, 4), cb).as("rv"))
      .as[(Long, Seq[Int], Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for ((v, i) <- vecs.zipWithIndex) {
      val expect = (0 until 2).map { m =>
        val sub = v.slice(m * 4, m * 4 + 4).map(_.toDouble)
        (0 until 8).minBy(j =>
          (sub.zip(cb(m)(j)).foldLeft(0.0) { case (acc, (x, c)) => acc + (x - c) * (x - c) }, j))
      }
      val (codes, rv) = got(i.toLong)
      assert(codes == expect, s"vec $i: $v")
      assert(rv == codes.zipWithIndex.flatMap { case (j, m) => cb(m)(j) }, s"vec $i recon")
    }
  }
}
