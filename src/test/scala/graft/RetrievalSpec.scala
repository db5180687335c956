package graft

import graft.functions.Retrieval
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** BM25 top-k: engine output vs a from-first-principles driver-side
  * scorer over the same fixture (plain Scala collections — an independent
  * code path through the same IEEE ops). */
class RetrievalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val fixture = Seq(
    (1L, "spark spark spark joins data"),
    (2L, "spark query engine"),
    (3L, "query query query query planner cost model estimate"),
    (4L, "totally unrelated words only here"),
    (5L, "spark query spark query mixed relevance doc"),
    (6L, "one spark mention in a much longer document with many filler words present")
  )

  /** Reference BM25 (same formula, same literals, driver-side). */
  private def referenceScores(terms: Set[String]): Map[Long, (Long, Long)] = {
    val docs = fixture.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = docs.size.toLong
    val sumDl = docs.map(_._2.size.toLong).sum
    val avgdl = sumDl.toDouble / n.toDouble
    val dfm = terms.map(w => w -> docs.count(_._2.contains(w)).toLong).toMap
    docs.flatMap { case (id, toks) =>
      val dl = toks.size.toLong
      val perTerm = terms.toSeq.flatMap { w =>
        val tf = toks.count(_ == w).toLong
        if (tf == 0 || dfm(w) == 0) None
        else {
          val df = dfm(w)
          val idf = (n - df + 0.5) / (df + 0.5)
          val norm = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
          Some(math.floor(idf * norm * 1048576.0).toLong)
        }
      }
      if (perTerm.isEmpty) None else Some(id -> (perTerm.size.toLong, perTerm.sum))
    }.toMap
  }

  test("bm25TopK matches the driver-side reference scorer, ranked with doc_id ties") {
    val terms = Seq("spark", "query")
    val got = Retrieval
      .bm25TopK(fixture.toDF("doc_id", "text"), "doc_id", "text", terms, topK = 10)
      .as[(Long, Long, Long)].collect()
    val ref = referenceScores(terms.toSet)
    val expected = ref.toSeq
      .map { case (id, (nt, s)) => (id, nt, s) }
      .sortBy { case (id, _, s) => (-s, id) }
    assert(got.toSeq === expected)
    // Sanity on the fixture's shape: doc 4 has no query term; tf dominance
    // ranks the heavy-tf docs above the single-mention long doc.
    assert(!got.exists(_._1 == 4L))
    assert(got.map(_._1).indexOf(6L) > got.map(_._1).indexOf(1L))
  }

  test("persisted index: pruned-scan scores equal the direct scorer; increments merge") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val terms = Seq("the", "order", "hash")
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    Retrieval.writeBm25Index(half1, "doc_id", "text", dir, buckets = 16)
    Retrieval.appendBm25Index(half2, "doc_id", "text", dir, buckets = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSeq
    val fromIndex = rows(Retrieval.bm25TopKFromIndex(spark, dir, terms, 25, buckets = 16))
    val direct = rows(Retrieval.bm25TopK(docs, "doc_id", "text", terms, 25))
    assert(fromIndex === direct, "index-backed scores/ranks must be bit-identical")
    // The pruning contract: the postings scan must carry a bucket
    // partition filter (directory pruning), not read the whole index.
    val plan = Retrieval.bm25TopKFromIndex(spark, dir, terms, 25, buckets = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n$plan")
  }

  test("BM25 index batch-id ledger: a replayed tagged slice cannot double-count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val terms = Seq("the", "order", "hash")
    val dir = java.nio.file.Files.createTempDirectory("bm25_ledger").toString
    Retrieval.appendBm25Index(half1, "doc_id", "text", dir, 16, batchId = 0L)
    Retrieval.appendBm25Index(half1, "doc_id", "text", dir, 16, batchId = 0L) // re-delivery
    Retrieval.appendBm25Index(half2, "doc_id", "text", dir, 16, batchId = 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSeq
    // Replay collapses in BOTH layers (postings tf/df AND the stats'
    // n_docs/avgdl), so scores match the direct scorer bit-identically.
    assert(rows(Retrieval.bm25TopKFromIndex(spark, dir, terms, 25, buckets = 16)) ===
      rows(Retrieval.bm25TopK(docs, "doc_id", "text", terms, 25)))
  }

  test("BM25 decrement slices: takedown equals re-indexing without the docs") {
    // Negated postings + a negated stats delta must net the index to
    // exactly the rebuilt-without state: df, avgdl, n_docs, and every
    // fixed-point score — a taken-down doc's postings cancel to zero and
    // vanish behind the tf > 0 read filter. Replay collapses.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val doomed = docs.filter(col("doc_id") % 3 === 0)
    val terms = Seq("the", "order", "hash")
    val dir = java.nio.file.Files.createTempDirectory("bm25_dec").toString
    Retrieval.appendBm25Index(docs, "doc_id", "text", dir, 16, batchId = 0L)
    Retrieval.appendBm25Decrement(doomed, "doc_id", "text", dir, 16, batchId = 1L)
    Retrieval.appendBm25Decrement(doomed, "doc_id", "text", dir, 16, batchId = 1L) // replay
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSeq
    val got = rows(Retrieval.bm25TopKFromIndex(spark, dir, terms, 25, buckets = 16))
    assert(got === rows(Retrieval.bm25TopK(
      docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", terms, 25)))
    assert(got.nonEmpty)
  }

  test("topK bounds the result; unmatched terms contribute nothing") {
    val df = fixture.toDF("doc_id", "text")
    val top2 = Retrieval.bm25TopK(df, "doc_id", "text", Seq("spark", "query"), topK = 2)
      .as[(Long, Long, Long)].collect()
    assert(top2.length === 2)
    val ghost = Retrieval.bm25TopK(df, "doc_id", "text", Seq("zzz_absent"), topK = 5)
    assert(ghost.count() === 0L)
  }

  test("bm25TopKRanked: 1-based ranks in (score desc, doc_id) order, row parity") {
    val df = fixture.toDF("doc_id", "text")
    val plain = Retrieval.bm25TopK(df, "doc_id", "text", Seq("spark", "query"), topK = 4)
      .select(col("doc_id"), col("score_fp")).as[(Long, Long)].collect().toSeq
    val ranked = Retrieval.bm25TopKRanked(df, "doc_id", "text", Seq("spark", "query"), topK = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(ranked.map(_._1).toSeq === (1L to ranked.length))
    // Same docs, same scores, rank order == the plain operator's sort order.
    assert(ranked.map(r => (r._2, r._3)).toSeq === plain)
  }

  test("rrfFuse: hand-computed integer fusion, overlap counted from both lists") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), k0 = 60, topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // 1048576 div 61 = 17189, div 62 = 16912.
    assert(out === Seq(
      (2L, 2L, 17189L + 16912L), (1L, 1L, 17189L), (3L, 1L, 16912L)))
    // topK cut respects (rrf_fp desc, doc_id) ties.
    val cut = Retrieval.rrfFuse(Seq(a, b), k0 = 60, topK = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(cut === Seq((2L, 2L, 17189L + 16912L)))
  }
}
