package graft

import graft.functions.LangModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bigram stupid-backoff LM surprisal (the CCNet-style perplexity filter),
 * checked against hand-computed whole-bit scores.
 *
 * Reference doc "a b a b c": transitions (a,b)x2, (b,a), (b,c);
 * contexts a:2 b:2; transition-target unigrams b:2 a:1 c:1; T=4.
 * flog2: 1->0, 2->1, 4->2. backoffBits=2 -> oovBase = 2+2 = 4.
 */
class LangModelSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val ref = Seq((100L, "a b a b c")).toDF("doc_id", "text")

  test("bigramLm: counts and quantized surprisal bits") {
    val got = LangModel.bigramLm(ref, "doc_id", "text")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", "b", 2L, 0L), // flog2(2) - flog2(2)
      ("b", "a", 1L, 1L), // flog2(2) - flog2(1)
      ("b", "c", 1L, 1L)))
  }

  test("surprisal: bigram hit, backoff, OOV, and too-short docs") {
    val docs = Seq(
      (1L, "a b c z"), // (a,b)=0 bits, (b,c)=1, (c,z) OOV=4 -> 5 bits / 3
      (2L, "q a"),     // (q,a) backoff on a: 4 - flog2(1) = 4 -> 4 bits / 1
      (3L, "x"),       // single token: unscorable
      (4L, null.asInstanceOf[String])) // null text: unscorable
      .toDF("doc_id", "text")
    val got = LangModel.surprisal(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 3L, 5L, Some(5.0 / 3)),
      (2L, 1L, 4L, Some(4.0)),
      (3L, 0L, 0L, None),
      (4L, 0L, 0L, None)))
  }

  test("surprisal: backoff uses the unigram count (seen-but-new transition)") {
    // (c,b): bigram unseen, cur=b seen twice -> oovBase - flog2(2) = 3.
    val docs = Seq((1L, "c b")).toDF("doc_id", "text")
    val got = LangModel.surprisal(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(got.toSeq === Seq((1L, 1L, 3L, Some(3.0))))
  }

  test("perplexityGate: keeps low-surprisal and unscorable docs, drops the tail") {
    val docs = Seq(
      (1L, "a b c z"), // 5/3 bits/token -> keep at 1.7
      (2L, "q a"),     // 4.0 -> drop
      (3L, "x"))       // unscorable -> pass through
      .toDF("doc_id", "text")
    val kept = LangModel.perplexityGate(docs, ref, "doc_id", "text", maxBitsPerToken = 1.7)
    assert(kept.columns.toSeq ===
      Seq("doc_id", "text", "n_trans", "bits", "bits_per_token"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("surprisal3: trigram hit, bigram backoff, double-backoff OOV, short docs") {
    // Ref "a b a b c" triples: (a,b,a),(b,a,b),(a,b,c) each once;
    // contexts (a,b):2, (b,a):1 -> t_bits 1, 0, 1. Bigram/unigram layers
    // as in the bigram spec; oovBase=4, backoff penalty 2 per level.
    val docs = Seq(
      (1L, "a b a b c z"), // 1 + 0 + 1 + [(b,c,z): OOV 4+2=6] = 8 bits / 4
      (2L, "x b c"),       // (x,b,c): tri miss, bigram (b,c)=1 + 2 -> 3 / 1
      (3L, "q c a"),       // (q,c,a): tri+bigram miss, unigram a: 4+2-0=6 / 1
      (4L, "a b"))         // < 3 tokens: unscorable
      .toDF("doc_id", "text")
    val got = LangModel.surprisal3(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 4L, 8L, Some(2.0)),
      (2L, 1L, 3L, Some(3.0)),
      (3L, 1L, 6L, Some(6.0)),
      (4L, 0L, 0L, None)))
  }

  test("incremental counts: append + merge-on-read equals training on the union") {
    // Counts are additive integers, so a store built as snapshot + delta
    // must score IDENTICALLY to a model trained on the union — the exact
    // guarantee a daily-increment pipeline needs. Compaction preserves it.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref1 = docs.filter(col("doc_id") % 20 === 0)
    val ref2 = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 20 =!= 0)
    val refAll = docs.filter(col("doc_id") % 10 === 0)
    val live = docs.filter(col("doc_id") % 10 =!= 0).limit(100)
    val dir = java.nio.file.Files.createTempDirectory("lm_inc").toString
    LangModel.writeLmCounts(ref1, "doc_id", "text", dir)
    LangModel.appendLmCounts(ref2, "doc_id", "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    val merged = rows(LangModel.surprisalWith(
      live, LangModel.readLm(spark, dir), "doc_id", "text"))
    val union = rows(LangModel.surprisal(live, refAll, "doc_id", "text"))
    assert(merged === union)
    val dir2 = java.nio.file.Files.createTempDirectory("lm_inc2").toString
    LangModel.compactLm(spark, dir, dir2)
    assert(rows(LangModel.surprisalWith(
      live, LangModel.readLm(spark, dir2), "doc_id", "text")) === union)
    assertThrows[IllegalArgumentException](LangModel.compactLm(spark, dir, dir))
  }

  test("LM store batch-id ledger: a replayed tagged slice cannot double-count") {
    // Checkpoint recovery re-executes the last uncommitted foreachBatch
    // with the SAME id — simulated here by a duplicate tagged append.
    // Both LM layers must come back bit-identical to single delivery.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref1 = docs.filter(col("doc_id") % 20 === 0)
    val ref2 = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 20 =!= 0)
    val live = docs.filter(col("doc_id") % 10 =!= 0).limit(60)
    val replayed = java.nio.file.Files.createTempDirectory("lm_ledger_r").toString
    LangModel.appendLm3Counts(ref1, "doc_id", "text", replayed, batchId = 7L)
    LangModel.appendLm3Counts(ref1, "doc_id", "text", replayed, batchId = 7L) // re-delivery
    LangModel.appendLm3Counts(ref2, "doc_id", "text", replayed, batchId = 8L)
    val once = java.nio.file.Files.createTempDirectory("lm_ledger_o").toString
    LangModel.appendLm3Counts(ref1, "doc_id", "text", once, batchId = 7L)
    LangModel.appendLm3Counts(ref2, "doc_id", "text", once, batchId = 8L)
    def rows2(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(rows2(LangModel.surprisalWith(
      live, LangModel.readLm(spark, replayed), "doc_id", "text")) ===
      rows2(LangModel.surprisalWith(
        live, LangModel.readLm(spark, once), "doc_id", "text")))
    assert(rows2(LangModel.surprisal3With(
      live, LangModel.readLm3(spark, replayed), "doc_id", "text")) ===
      rows2(LangModel.surprisal3With(
        live, LangModel.readLm3(spark, once), "doc_id", "text")))
    // Compaction collapses the ledger too (distinct before re-aggregate).
    val compacted = java.nio.file.Files.createTempDirectory("lm_ledger_c").toString
    LangModel.compactLm(spark, replayed, compacted)
    assert(rows2(LangModel.surprisalWith(
      live, LangModel.readLm(spark, compacted), "doc_id", "text")) ===
      rows2(LangModel.surprisalWith(
        live, LangModel.readLm(spark, once), "doc_id", "text")))
  }

  test("decrement slices: takedown equals retraining without the docs, bit-identical") {
    // The additive algebra's takedown story: appending the doomed docs'
    // counts NEGATED must land the read-side sums exactly where a
    // retrain without them would — including the vocabulary edge (a
    // fully-decremented pair falls back to the unigram/OOV chain) and
    // the OOV literal (the transition total shrinks). Replayed takedown
    // slices collapse in the ledger; compaction preserves the netting.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.filter(col("doc_id") % 10 === 0)
    val doomed = docs.filter(col("doc_id") % 30 === 0)
    val live = docs.filter(col("doc_id") % 10 =!= 0).limit(100)
    val dir = java.nio.file.Files.createTempDirectory("lm_dec").toString
    LangModel.appendLm3Counts(ref, "doc_id", "text", dir, batchId = 0L)
    LangModel.appendLm3CountsNegated(doomed, "doc_id", "text", dir, batchId = 1L)
    LangModel.appendLm3CountsNegated(doomed, "doc_id", "text", dir, batchId = 1L) // replay
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    val refWithout = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 30 =!= 0)
    assert(rows(LangModel.surprisalWith(
      live, LangModel.readLm(spark, dir), "doc_id", "text")) ===
      rows(LangModel.surprisal(live, refWithout, "doc_id", "text")))
    assert(rows(LangModel.surprisal3With(
      live, LangModel.readLm3(spark, dir), "doc_id", "text")) ===
      rows(LangModel.surprisal3(live, refWithout, "doc_id", "text")))
    // Compaction nets the decrements away and stays score-identical.
    val dir2 = java.nio.file.Files.createTempDirectory("lm_dec_c").toString
    LangModel.compactLm(spark, dir, dir2)
    assert(rows(LangModel.surprisalWith(
      live, LangModel.readLm(spark, dir2), "doc_id", "text")) ===
      rows(LangModel.surprisal(live, refWithout, "doc_id", "text")))
    assert(spark.read.parquet(s"$dir2/pairs").filter(col("n") <= 0).count() === 0L,
      "compaction must drop netted-to-zero pairs")
  }

  test("trigram store: append + merge-on-read equals training on the union") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref1 = docs.filter(col("doc_id") % 20 === 0)
    val ref2 = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 20 =!= 0)
    val refAll = docs.filter(col("doc_id") % 10 === 0)
    val live = docs.filter(col("doc_id") % 10 =!= 0).limit(60)
    val dir = java.nio.file.Files.createTempDirectory("lm3_inc").toString
    LangModel.writeLm3Counts(ref1, "doc_id", "text", dir)
    LangModel.appendLm3Counts(ref2, "doc_id", "text", dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(rows(LangModel.surprisal3With(
      live, LangModel.readLm3(spark, dir), "doc_id", "text")) ===
      rows(LangModel.surprisal3(live, refAll, "doc_id", "text")))
  }

  test("minPairCount pruning: dropped bigrams fall back to the unigram level") {
    // Ref transitions (a,b)x2, (b,a), (b,c): minPairCount=2 keeps only
    // (a,b); contexts/unigrams/total stay unpruned. Doc "a b c":
    // (a,b) bigram 0 bits; (b,c) now backs off on cur=c (unigram count
    // 1): oovBase - flog2(1) = 4. Total 4 bits / 2 transitions.
    val pairs = Seq(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L))
      .toDF("prev", "cur", "n")
    val lm = LangModel.lmFromPairs(pairs, backoffBits = 2, minPairCount = 2)
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = LangModel.surprisalWith(docs, lm, "doc_id", "text")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(got.toSeq === Seq((1L, 2L, 4L, Some(2.0))))
  }

  test("perplexityGate fails fast on output-column collisions") {
    val docs = Seq((1L, "a b", 9L)).toDF("doc_id", "text", "bits")
    val e = intercept[IllegalArgumentException](
      LangModel.perplexityGate(docs, ref, "doc_id", "text", 4.0))
    assert(e.getMessage.contains("bits"))
  }

  test("surprisal is partitioning-invariant (integer bit sums)") {
    val docs = (1L to 40L).map(i => (i, s"a b c token$i a b")).toDF("doc_id", "text")
    val a = LangModel.surprisal(docs.repartition(7), ref, "doc_id", "text")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    val b = LangModel.surprisal(docs.coalesce(1), ref, "doc_id", "text")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("collocations: hand-computed whole-bit PMI; hapax floor tames PMI explosion") {
    // Transitions: doc1 "a b a b c" -> (a,b)x2 (b,a) (b,c);
    //              doc2 "x y x y"   -> (x,y)x2 (y,x).  T = 7, flog2(7) = 2.
    // (a,b): 1+2-1-1 = 1   (x,y): 1+2-1-1 = 1   (tie -> w1 order)
    // hapax (y,x): 0+2-0-0 = 2 -> tops the board iff minCount = 1.
    val docs = Seq((1L, "a b a b c"), (2L, "x y x y")).toDF("doc_id", "text")
    val floored = LangModel.collocations(docs, "doc_id", "text", minCount = 2L, k = 20)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(floored === Seq(("a", "b", 2L, 1L), ("x", "y", 2L, 1L)))
    val unfloored = LangModel.collocations(docs, "doc_id", "text", minCount = 1L, k = 1)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(unfloored === Seq(("y", "x", 1L, 2L)),
      "a once-seen pair of rare tokens must dominate unfloored PMI")
  }
}
