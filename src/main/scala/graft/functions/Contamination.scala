package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Benchmark decontamination: find corpus documents that share long
 * character n-grams with an evaluation set — the "did the training data
 * leak the benchmark" scan every LLM pipeline runs before training.
 *
 * Shape at 100 TB: the eval side is small by construction (benchmarks are
 * thousands of documents, not billions), so its distinct shingle set is
 * BROADCAST; the corpus side is one narrow shingle-explode pass joined
 * map-side against that set, and the only shuffle carries the matched
 * (doc, shingle-hit) rows — a tiny fraction of the corpus — into the
 * per-doc count. Nothing corpus-sized ever shuffles or sorts.
 *
 * Shingles are hashed (XXH64) on both sides, so the join carries 8-byte
 * keys; the overlap count equals the string-shingle count absent an XXH64
 * collision inside a doc's eval-intersection (~1e-14 per doc — the same
 * argument as the MinHash/ngram oracle families, asserted corpus-wide by
 * FastKernelSpec for the underlying kernel).
 */
object Contamination {

  private def shingles(textCol: String, k: Int) =
    FastText.hashedShinglesNN(col(textCol), k)

  /** The persisted side of (streaming) decontamination: the eval set's
    * distinct hashed k-char shingles, one `sh: long` column. Benchmarks
    * change rarely — compute once, write to storage, reuse for every
    * corpus pass and every micro-batch. */
  def evalShingles(evalSet: DataFrame, textCol: String, k: Int = 16): DataFrame =
    evalSet
      .filter(col(textCol).isNotNull)
      .select(explode_outer(shingles(textCol, k)).as("sh"))
      .distinct()

  /** Corpus docs sharing at least `minOverlap` distinct k-char shingles
    * with the union of the eval set's shingles.
    * Output: (doc_id, n_overlap), one row per contaminated doc.
    *
    * `k` should be long enough that incidental prose overlap is rare
    * (16-32 chars ≈ the classic 8-13 token window); `minOverlap` then
    * separates quotation-level contamination from chance collisions. */
  def contaminatedDocs(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 16,
      minOverlap: Int = 10): DataFrame =
    contaminatedAgainst(
      KernelInput.ensureParallelismIfScan(corpus.filter(col(textCol).isNotNull)),
      evalShingles(evalSet, textCol, k), idCol, textCol, k, minOverlap)

  /** [[contaminatedDocs]] against a precomputed (typically persisted)
    * shingle set. The corpus side is one narrow explode pass; the eval
    * side broadcasts; only matched rows shuffle. */
  def contaminatedAgainst(
      corpus: DataFrame,
      evShingles: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minOverlap: Int): DataFrame =
    corpus
      .filter(col(textCol).isNotNull)
      // id passes through untyped: a UUID-keyed corpus must not hit a
      // LongType cast (ANSI throws; legacy mode would null the id and
      // silently disable the filter downstream).
      .select(col(idCol).as("doc_id"), explode_outer(shingles(textCol, k)).as("sh"))
      .join(broadcast(evShingles), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)

  /** Per-micro-batch decontamination filter: only documents sharing fewer
    * than `minOverlap` shingles with the eval set reach `sink` — the
    * streaming face of the pre-training leak scan, mirroring
    * [[graft.streaming.StreamDedup.nearDupFilterAgainstIndex]]: the
    * "state" is the persisted eval shingle set, not the state store, so
    * the stream is unbounded-corpus-safe and the eval set can be swapped
    * without restarting state. */
  def cleanStream(
      stream: DataFrame,
      evShingles: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 16,
      minOverlap: Int = 10)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val dirty = contaminatedAgainst(batch, evShingles, idCol, textCol, k, minOverlap)
          .select(col("doc_id").as("__dirty_id"))
        sink(
          batch.join(broadcast(dirty), batch(idCol) === col("__dirty_id"), "left_anti"),
          id)
      }
    }
}
