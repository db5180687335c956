package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Multinomial naive Bayes over whitespace tokens — the generative sibling
 * of the discriminative classifiers ([[Classifier]]'s perceptron,
 * `Similarity.knnClassify`, `classCentroids`): the standard cheap
 * language-ID / domain-ID stage of a training-data pipeline (fastText-class
 * models are linear over n-gram counts; this is the count-only core with
 * add-one smoothing).
 *
 * Arithmetic is QUANTIZED TO EIGHTH-BITS: every log2 is the piecewise-
 * linear integer approximation l8(n) = 8·msb + ((8n) >> msb) − 8 with
 * msb = floor(log2 n) = length(bin(n)) − 1 — monotone, within 0.086 bits
 * of 8·log2(n)/8, and a pure integer/string computation Spark and DuckDB
 * evaluate identically — so per-document class scores are exact integer
 * sums (order-independent) and the argmin is deterministic (ties toward
 * the smaller label). Whole-bit floors (the [[LangModel]] convention) are
 * NOT enough here: the per-class constant l8(tot_c + V) jumps in powers of
 * two under flog2, which over-penalizes large classes by up to a full bit
 * per token — more than the per-token signal between languages — and the
 * classifier collapses to the smallest class. The LM keeps whole bits
 * because its scores are only THRESHOLDED per doc; a classifier COMPARES
 * scores across classes, so the quantization error must sit well under
 * the class gap. The scoring decomposition keeps smoothing integer-exact:
 * with add-one smoothing, −8·log2 p(w|c) ≈ l8(tot_c + V) − l8(cnt_c(w)+1),
 * and the first term is per-CLASS constant, so
 *
 *   bits8(d, c) = prior8(c) + n_tok(d)·base8(c) − Σ_{w∈d, cnt_c(w)>0}
 *                 l8(cnt_c(w) + 1)
 *
 * — unseen tokens contribute l8(0 + 1) = 0 and vanish from the sum, so
 * the matched-token join only materializes (token, class) hits that exist
 * in the model (Zipf-bounded), never the |tokens|·|classes| grid.
 *
 * 100 TB shape: training is ONE explode + (label, token) count aggregation
 * (the shuffle carries one row per distinct pair per class — Zipf-bounded)
 * plus two 1-row driver aggregates (vocabulary size, doc total — the
 * lm_coverage metadata-collect convention) inlined as literals. Scoring is
 * one un-hinted token-keyed equi-join of the query token stream against the
 * model (AQE broadcasts small models, shuffle-joins web-scale ones), one
 * (doc, label) partial aggregation, and one explicitly-broadcast cross join
 * of per-doc stats against the CLASS frame — label-cardinality rows,
 * metadata-scale by construction (the duplicateClusters boundary-roots
 * posture), so the nested-loop is bounded at any corpus size. The argmin is
 * a bounded per-doc `min(struct(bits8, label))` — no window, no driver
 * loop.
 */
object NaiveBayes {

  /** 8·log2(n) to eighth-bit precision as the engine-portable integer
    * computation 8·msb + ((8n) >> msb) − 8, msb = length(bin(n)) − 1
    * (DuckDB evaluates the same expression verbatim). Monotone; exact at
    * powers of two; chord error < 0.7 eighth-bits. Overflows only past
    * n ≥ 2^60 (the 8n product). */
  private def l8(c: Column): Column = {
    val n = c.cast(LongType)
    val msb = (length(bin(n)) - lit(1)).cast(IntegerType)
    (lit(8L) * msb.cast(LongType) +
      call_function("shiftright", lit(8L) * n, msb) - lit(8L)).cast(LongType)
  }

  /** A trained model: `tokenCounts` (label, w, n) — the Zipf-bounded count
    * table — and `classFrame` (label, prior8, base8) — one row per class
    * with the two per-class constants of the scoring decomposition. Both
    * are pure reference STATE (persist/reload like the LM counts). */
  final case class NbModel(tokenCounts: DataFrame, classFrame: DataFrame)

  /** Train on `docs` (null-text rows are not documents): one corpus-scan
    * count aggregation + two metadata-scale 1-row collects (vocab size V,
    * doc total N) inlined as literals into the class frame. */
  def train(docs: DataFrame, labelCol: String, textCol: String): NbModel = {
    val (cnt, cdocs) = countFrames(docs, labelCol, textCol)
    modelFrom(cnt, cdocs)
  }

  /** The model's canonical, ADDITIVE form: token counts (label, w, n) and
    * per-class doc counts (label, n_docs) — counts add, so corpus slices
    * merge by sum (the LM-counts convention); the class frame and its two
    * literals are derived views. */
  private def countFrames(
      docs: DataFrame, labelCol: String, textCol: String): (DataFrame, DataFrame) = {
    val tr = docs.filter(col(textCol).isNotNull)
    val cnt = tr
      .select(col(labelCol).as("label"),
        explode(TextFunctions.wsTokens(col(textCol))).as("w"))
      .groupBy(col("label"), col("w")).agg(count(lit(1)).as("n"))
    val cdocs = tr.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_docs"))
    (cnt, cdocs)
  }

  /** Derive the scoring model from (already-summed) count frames: the two
    * 1-row collects (V, N) land here, inlined as literals. */
  private def modelFrom(cnt: DataFrame, cdocs: DataFrame): NbModel = {
    val vocabSize = cnt.select(countDistinct(col("w"))).collect()(0).getLong(0)
    val nDocs = cdocs.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    val ctot = cnt.groupBy(col("label")).agg(sum(col("n")).as("tot"))
    val classFrame = cdocs.join(ctot, "label")
      .select(col("label"),
        (l8(lit(nDocs)) - l8(col("n_docs"))).as("prior8"),
        l8(col("tot") + lit(vocabSize)).as("base8"))
    NbModel(cnt, classFrame)
  }

  /** Persist a corpus slice's model counts (layout: `token_counts/` +
    * `class_docs/`, both additive — the writeLmCounts log-structured
    * posture: slices land as files, [[readNb]] sums on read). Append
    * slices must be DISJOINT from what the store holds (re-counting a
    * document double-counts it — the LM/BM25 caller contract; contrast
    * the overlap-tolerant HLL register store). */
  def writeNbCounts(
      docs: DataFrame, labelCol: String, textCol: String, path: String): Unit =
    writeSlice(docs, labelCol, textCol, path, overwrite = true, batchId = None)

  /** Add a disjoint corpus slice to an existing store (see
    * [[writeNbCounts]]). */
  def appendNbCounts(
      docs: DataFrame, labelCol: String, textCol: String, path: String): Unit =
    writeSlice(docs, labelCol, textCol, path, overwrite = false, batchId = None)

  /** Append one slice TAGGED with a replay-stable batch id — the
    * [[StoreLedger]] move: a re-delivered batch (at-least-once delivery,
    * foreachBatch checkpoint recovery) rewrites byte-identical tagged
    * rows in BOTH layers that [[readNb]]'s distinct collapses, so
    * replays cannot double-count. Tagged or untagged per store, never
    * mixed. */
  def appendNbCounts(
      docs: DataFrame, labelCol: String, textCol: String, path: String,
      batchId: Long): Unit =
    writeSlice(docs, labelCol, textCol, path, overwrite = false,
      batchId = Some(batchId))

  /** Takedown for the ADDITIVE NB store: append the doomed documents'
    * counts NEGATED in both layers under one batch id — the read-side
    * sums land exactly where retraining without those documents would
    * (bit-identical: vocabulary size, class totals, and priors all
    * derive from the netted counts; ClassifierSpec pins it). A replayed
    * takedown collapses in the ledger like any slice. Caller contract:
    * the doomed docs must actually be in the store ([[readNb]]'s
    * net-positive filters drop over-decremented keys rather than
    * corrupting the quantized scores). */
  def appendNbCountsNegated(
      docs: DataFrame, labelCol: String, textCol: String, path: String,
      batchId: Long): Unit = {
    val (cnt, cdocs) = countFrames(docs, labelCol, textCol)
    StoreLedger.tag(
        cnt.select(col("label"), col("w"), (-col("n")).as("n")), batchId)
      .write.mode("append").parquet(s"$path/token_counts")
    StoreLedger.tag(
        cdocs.select(col("label"), (-col("n_docs")).as("n_docs")), batchId)
      .write.mode("append").parquet(s"$path/class_docs")
  }

  private def writeSlice(
      docs: DataFrame, labelCol: String, textCol: String, path: String,
      overwrite: Boolean, batchId: Option[Long]): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    val (cnt, cdocs) = countFrames(docs, labelCol, textCol)
    val (c, cd) = batchId match {
      case Some(id) => (StoreLedger.tag(cnt, id), StoreLedger.tag(cdocs, id))
      case None     => (cnt, cdocs)
    }
    c.write.mode(mode).parquet(s"$path/token_counts")
    cd.write.mode(mode).parquet(s"$path/class_docs")
  }

  /** Rebuild the model from stored counts: slices sum on read, so the
    * model — and every downstream classification — is bit-identical to
    * [[train]] on the union of all slices (ClassifierSpec pins the
    * parity). */
  def readNb(spark: org.apache.spark.sql.SparkSession, path: String): NbModel =
    // Net-positive only: a fully-decremented token must leave the
    // vocabulary (V = countDistinct over this frame) and a fully-removed
    // class must leave the prior table — n=0 rows would skew both.
    modelFrom(
      StoreLedger.collapse(spark.read.parquet(s"$path/token_counts"))
        .groupBy(col("label"), col("w")).agg(sum(col("n")).as("n"))
        .filter(col("n") > 0),
      StoreLedger.collapse(spark.read.parquet(s"$path/class_docs"))
        .groupBy(col("label")).agg(sum(col("n_docs")).as("n_docs"))
        .filter(col("n_docs") > 0))

  /** Classify every non-null-text doc: `(doc_id, pred, bits8)` with
    * bits8 = the winning class's integer score in eighth-bits (smaller =
    * more likely), ties toward the smaller label. A doc whose tokens are
    * all unseen is still classified (prior + n_tok·base8 — the smoothed
    * floor). */
  def classify(docs: DataFrame, model: NbModel, idCol: String, textCol: String): DataFrame = {
    val qtok = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.wsTokens(col(textCol))).as("w"))
    val qstat = qtok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    // Matched-hit sums only — unseen (token, class) pairs contribute 0
    // eighth-bits by the smoothing identity, so nothing grid-shaped exists.
    val hits = qtok.join(model.tokenCounts, "w")
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(l8(col("n") + lit(1))).as("msum"))
    qstat.crossJoin(broadcast(model.classFrame))
      .join(hits, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        (col("prior8") + col("n_tok") * col("base8")
          - coalesce(col("msum"), lit(0L))).as("bits8"))
      .groupBy(col("doc_id"))
      .agg(min(struct(col("bits8"), col("label"))).as("w"))
      .select(col("doc_id"), col("w.label").as("pred"), col("w.bits8").as("bits8"))
  }

  /** Confusion counts `(actual, pred, n)` of [[classify]] against the
    * docs' own labels — the evaluation face (the perceptron_confusion
    * convention: assert the trained model moves, not just runs). */
  def confusion(
      docs: DataFrame, model: NbModel,
      idCol: String, labelCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(labelCol).as("actual"))
      .join(classify(docs, model, idCol, textCol), "doc_id")
      .groupBy(col("actual"), col("pred"))
      .agg(count(lit(1)).as("n"))
}
