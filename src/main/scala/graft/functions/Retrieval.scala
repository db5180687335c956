package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextFunctions.{wsTokens => wsTok}

/**
 * BM25 top-k retrieval over the corpus — the "find the documents most
 * relevant to these terms" primitive behind eval-set mining, targeted
 * decontamination review, and seed-document expansion.
 *
 * Scoring is Robertson BM25 with the UNLOGGED idf ratio
 * `(N - df + 0.5) / (df + 0.5)` (log-free, the tfidf_topk convention):
 * every input (tf, df, dl, N) is an exact integer and every operation in
 * the score is a single correctly-rounded IEEE op, written with IDENTICAL
 * parenthesization in the engine and the DuckDB oracle — so the doubles
 * are bit-equal cross-engine, no log() ulp drift. Per-term scores are
 * fixed-pointed (floor(s * 2^20)) before the per-doc sum, making the sum
 * an order-independent integer — safe under any partitioning.
 *
 * Scale shape:
 *  - one narrow corpus aggregation for (N, sum dl) — a 1-row broadcast
 *    (the q14_subq shape), reusable across every query of the corpus;
 *  - one corpus explode pass whose very next operator drops every
 *    non-query token, so the tf shuffle carries only query-term hits;
 *  - df is derived from the (tiny) tf frame, broadcast back;
 *  - the final top-k is a bounded TakeOrderedAndProject, never a global
 *    sort of the scored set.
 */
object Retrieval {

  /** Top `topK` documents by summed BM25 (k1 = 1.2, b = 0.75) over the
    * literal `terms`. Output: (doc_id, n_terms, score_fp) where score_fp
    * is the fixed-point (2^-20) score sum; ties break on doc_id. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      topK: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val d = docs.filter(col(textCol).isNotNull)
    val stats = d.agg(
      count(lit(1)).cast(LongType).as("n_docs"),
      sum(size(wsTok(col(textCol))).cast(LongType)).as("sum_dl"))
    val hits = d
      .select(col(idCol).as("doc_id"),
        size(wsTok(col(textCol))).cast(LongType).as("dl"),
        explode(wsTok(col(textCol))).as("word"))
      .filter(col("word").isin(terms: _*))
    val tf = hits
      .groupBy(col("doc_id"), col("dl"), col("word"))
      .agg(count(lit(1)).cast(LongType).as("tf"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).cast(LongType).as("df"))
    // Identical parse tree to the oracle SQL — literals 0.5/2.2/1.2/0.25/
    // 0.75 appear verbatim on both sides (never derived, e.g. 1.2 + 1.0
    // need not round to the double of "2.2").
    val avgdl = col("sum_dl") / col("n_docs")
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val norm = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl)))
    tf.join(broadcast(dfreq), "word")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(idf * norm * lit(Median.Scale)).cast(LongType).as("s_fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s_fp")).as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(topK)
  }
}
