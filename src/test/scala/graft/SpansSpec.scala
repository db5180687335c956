package graft

import graft.functions.Spans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Span-level cleaning (Spans.spanDedup / boilerplateStrip) against a
  * brute-force in-memory reference on hand and randomized fixtures. */
class SpansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val K = 4 // small span length so fixtures exercise multi-span docs

  // ---- brute-force reference -------------------------------------------

  private def refSpans(text: String, k: Int): Seq[String] =
    text.split(" ", -1).grouped(k).map(_.mkString(" ")).toSeq

  /** First-corpus-wide-occurrence dedup, processing spans in global
    * (doc_id, span_idx) order. */
  private def refSpanDedup(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
    val seen = scala.collection.mutable.Set[String]()
    val out = scala.collection.mutable.LinkedHashMap[Long, (Long, Long, String)]()
    for ((id, text) <- docs.sortBy(_._1) if text.nonEmpty) {
      val spans = refSpans(text, k)
      val kept = spans.filter(s => seen.add(s))
      if (kept.nonEmpty) out(id) = (spans.size.toLong, kept.size.toLong, kept.mkString(" "))
    }
    out.toMap
  }

  /** Drop every occurrence of spans present in >= minDf distinct docs. */
  private def refBoilerplate(
      docs: Seq[(Long, String)], k: Int, minDf: Int): Map[Long, (Long, Long, String)] = {
    val present = docs.filter(_._2.nonEmpty)
    val dfCount = present
      .flatMap { case (id, t) => refSpans(t, k).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
    val bp = dfCount.filter(_._2 >= minDf).keySet
    present.flatMap { case (id, t) =>
      val spans = refSpans(t, k)
      val kept = spans.filterNot(bp)
      if (kept.isEmpty) None
      else Some(id -> ((spans.size.toLong, kept.size.toLong, kept.mkString(" "))))
    }.toMap
  }

  private def run(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, String)] =
    df.select(col("doc_id"), col("n_spans"), col("n_kept"), col("clean_text"))
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, n, kk, t) => id -> ((n, kk, t)) }.toMap

  // ---- fixtures ---------------------------------------------------------

  // 4-word spans: doc 1 is original; doc 2 repeats doc 1 exactly (all spans
  // dup -> doc vanishes); doc 3 shares its first span with doc 1 but not
  // the second; doc 4 repeats a span INSIDE itself.
  private val fixture = Seq(
    1L -> "a b c d e f g h",
    2L -> "a b c d e f g h",
    3L -> "a b c d x y z w",
    4L -> "p q r s p q r s p q r s t",
    5L -> "")

  test("spanDedup: first occurrence wins; exact-dup doc vanishes; intra-doc repeats collapse") {
    val got = run(Spans.spanDedup(fixture.toDF("doc_id", "text"), "doc_id", "text", K))
    val want = refSpanDedup(fixture, K)
    assert(got === want)
    // Spot-check the semantics directly, not just via the reference:
    assert(!got.contains(2L), "exact-duplicate doc must disappear")
    assert(got(3L)._3 === "x y z w", "doc 3 keeps only its novel span")
    assert(got(4L)._3 === "p q r s t", "intra-doc repeats keep the first copy")
    assert(got(1L) === ((2L, 2L, "a b c d e f g h")), "the original is untouched")
  }

  test("boilerplateStrip: spans at df >= minDf drop everywhere, including the first copy") {
    // "a b c d" occurs in docs 1, 2, 3 (df=3); "e f g h" in docs 1, 2 (df=2).
    val got = run(Spans.boilerplateStrip(fixture.toDF("doc_id", "text"), "doc_id", "text",
      K, minDf = 3))
    val want = refBoilerplate(fixture, K, minDf = 3)
    assert(got === want)
    assert(got(1L)._3 === "e f g h", "df=3 span stripped from the FIRST doc too")
    assert(got(2L)._3 === "e f g h", "df=2 span survives a minDf=3 strip")
    assert(got(3L)._3 === "x y z w")
  }

  test("randomized corpus: engine matches the brute-force reference for both operators") {
    val rnd = new Random(7)
    val vocab = Vector("k0", "k1", "k2", "k3", "k4", "k5", "k6", "k7")
    def doc(): String =
      Seq.fill(1 + rnd.nextInt(24))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // 40 base docs + 10 exact duplicates of earlier docs.
    val base = (1L to 40L).map(i => i -> doc())
    val dups = (41L to 50L).map(i => i -> base(rnd.nextInt(base.size))._2)
    val docs = base ++ dups
    val df = docs.toDF("doc_id", "text").repartition(7)
    assert(run(Spans.spanDedup(df, "doc_id", "text", K)) === refSpanDedup(docs, K))
    for (minDf <- Seq(2, 3))
      assert(run(Spans.boilerplateStrip(df, "doc_id", "text", K, minDf)) ===
        refBoilerplate(docs, K, minDf))
  }

  test("spanDedup: deterministic under repartitioning") {
    val a = run(Spans.spanDedup(fixture.toDF("doc_id", "text"), "doc_id", "text", K))
    val b = run(Spans.spanDedup(fixture.toDF("doc_id", "text").repartition(13),
      "doc_id", "text", K))
    assert(a === b)
  }

  test("cleanStream: micro-batches against a persisted span index == batch spanDedup parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("spanidx").toString
    // Seed corpus -> persisted digest store.
    val corpus = Seq(1L -> "a b c d e f g h")
    Spans.writeSpanIndex(corpus.toDF("doc_id", "text"), "doc_id", "text", K, dir)
    val in = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    val q = Spans.cleanStream(in.toDF.toDF("doc_id", "text"), dir, "doc_id", "text", K) {
      (df, _) =>
        collected ++= df.select(col("doc_id"), col("n_spans"), col("n_kept"), col("clean_text"))
          .as[(Long, Long, Long, String)].collect()
          .map { case (id, n, kk, t) => id -> ((n, kk, t)) }
    }.start()
    // Batch 1: one span repeats the stored corpus, one is novel; doc 11 is new.
    val b1 = Seq(10L -> "a b c d x y z w", 11L -> "m n o p")
    // Batch 2: doc 20 repeats batch 1's novel span; doc 21 duplicates doc 11 exactly.
    val b2 = Seq(20L -> "x y z w q r s t", 21L -> "m n o p")
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // Parity: batch spanDedup over (store corpus ++ batch1 ++ batch2) —
    // id order mirrors arrival order — restricted to the streamed docs.
    val want = refSpanDedup(corpus ++ b1 ++ b2, K) - 1L
    assert(collected.toMap === want)
    assert(!collected.contains(21L), "exact-dup doc in a later batch is fully suppressed")
    assert(collected(20L)._3 === "q r s t", "span sunk in batch 1 dedups batch 2")
  }

  test("cleanStream: replayed micro-batch is idempotent (digests already in store)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("spanreplay").toString
    Spans.writeSpanIndex(Seq(1L -> "a b c d e f g h").toDF("doc_id", "text"),
      "doc_id", "text", K, dir)
    val b1 = Seq(10L -> "a b c d x y z w", 11L -> "m n o p")
    def runOnce(): Map[Long, (Long, Long, String)] = {
      val in = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.Map[Long, (Long, Long, String)]()
      val q = Spans.cleanStream(in.toDF.toDF("doc_id", "text"), dir, "doc_id", "text", K) {
        (df, _) =>
          got ++= df.select(col("doc_id"), col("n_spans"), col("n_kept"), col("clean_text"))
            .as[(Long, Long, Long, String)].collect()
            .map { case (id, n, kk, t) => id -> ((n, kk, t)) }
      }.start()
      in.addData(b1: _*); q.processAllAvailable(); q.stop()
      got.toMap
    }
    val first = runOnce()
    // At-least-once replay: the batch re-runs with its own first-occurrence
    // digests already appended. The strictly-earlier-provenance guard must
    // reproduce the output instead of sinking nothing.
    val replayed = runOnce()
    assert(first.nonEmpty && first(10L)._3 === "x y z w")
    assert(replayed === first)
  }

  test("intraDocStrip: first span occurrence wins WITHIN a doc; docs never interact") {
    // doc 1: span "a b" repeats at idx 0, 2 (and once more in the ragged
    // tail as "a"); doc 2 repeats doc 1's span but must be untouched —
    // the operator is strictly intra-document.
    val df = Seq(
      1L -> "a b x y a b a",
      2L -> "a b c d",
      3L -> "p q p q p q").toDF("doc_id", "text")
    val got = Spans.intraDocStrip(df, "doc_id", "text", k = 2)
      .select(col("doc_id"), col("n_spans"), col("n_kept"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, nk) => id -> ((n, nk)) }.toMap
    assert(got(1L) == ((4L, 3L)), "doc 1: spans [a b, x y, a b, a] -> kept [a b, x y, a]")
    assert(got(2L) == ((2L, 2L)), "doc 2 keeps both spans despite sharing doc 1's")
    assert(got(3L) == ((3L, 1L)), "doc 3: [p q, p q, p q] -> kept [p q]")
    // clean_hash is the fingerprint of the reassembly, not the original
    val h = Spans.intraDocStrip(df, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 3L).select(col("clean_hash"))
      .as[Long].head()
    val href = Spans.intraDocStrip(Seq(9L -> "p q").toDF("doc_id", "text"), "doc_id", "text", k = 2)
      .select(col("clean_hash")).as[Long].head()
    assert(h == href, "doc 3's cleaned text is exactly 'p q'")
  }

  test("spansOf: count arithmetic covers ragged tails and single-word docs") {
    val df = Seq(1L -> "w", 2L -> "a b c d e").toDF("doc_id", "text")
    val got = Spans.spansOf(df, "doc_id", "text", K)
      .select(col("doc_id"), col("span_idx"), col("span"))
      .as[(Long, Int, String)].collect().toSet
    assert(got === Set((1L, 0, "w"), (2L, 0, "a b c d"), (2L, 1, "e")))
  }
}
