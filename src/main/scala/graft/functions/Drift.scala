package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distribution-drift monitoring between two corpus epochs — "did this
 * week's crawl shift the quality/length/language mix" — as an exact
 * per-group chi-square statistic over binned feature histograms.
 *
 * Chi-square (not PSI/KL) deliberately: the divergence family needs
 * log(), whose last-ulp behavior differs across libm implementations;
 * chi-square is +,-,*,/ only — every step a correctly-rounded IEEE op —
 * and each bin's contribution is fixed-pointed (floor(c * 2^20)) before
 * the per-group sum, so the total is an order-independent integer,
 * reproducible on any engine and any partitioning.
 *
 * Scale shape: ONE corpus aggregation builds the (group, epoch, bin)
 * histogram (map-side combine; state = occupied bins, constant in corpus
 * size). Everything downstream — the epoch pivot, per-group totals,
 * expected counts, the statistic — runs on the bin-universe frame:
 * windows are partitioned by group over occupied bins only, and no
 * corpus row survives past the first aggregation.
 */
object Drift {

  /** Per-group chi-square between epoch 0 and epoch 1 of `epochCol` over
    * the `binCol` histogram. Output: (groupCol, n_bins, chi2), one row
    * per group present in BOTH epochs. The caller picks the binning;
    * multiply-by-power-of-two + floor keeps it bit-identical
    * cross-engine (the graft.functions.Median argument). */
  def chiSquareDrift(df: DataFrame, groupCol: String, epochCol: Column, binCol: Column): DataFrame =
    fromTaggedHist(
      df.groupBy(col(groupCol), epochCol.as("__e"), binCol.as("__bin"))
        .agg(count(lit(1)).as("__c")),
      groupCol)

  /** Chi-square between two PRE-AGGREGATED histograms `(groupCol, binCol,
    * cntCol)` — the reference-vs-current form: the reference side is
    * computed once and persisted; only the current side touches data.
    * Reference = epoch 0, current = epoch 1. */
  def chiSquareBetweenHists(refHist: DataFrame, curHist: DataFrame,
      groupCol: String, binCol: String, cntCol: String): DataFrame =
    fromTaggedHist(
      refHist.select(col(groupCol), lit(0L).as("__e"), col(binCol).as("__bin"),
          col(cntCol).cast(LongType).as("__c"))
        .union(curHist.select(col(groupCol), lit(1L).as("__e"), col(binCol).as("__bin"),
          col(cntCol).cast(LongType).as("__c"))),
      groupCol)

  /** The histogram side of [[chiSquareBetweenHists]]: bin + count, for
    * persisting a reference epoch once. */
  def histogram(df: DataFrame, groupCol: String, binCol: Column): DataFrame =
    df.groupBy(col(groupCol), binCol.as("bin")).agg(count(lit(1)).as("c"))

  /** Per-micro-batch drift alerting: each batch's histogram is scored
    * against the PERSISTED reference histogram and the (group, n_bins,
    * chi2) frame handed to `sink` — the "is today's ingest shaped like
    * the reference corpus" monitor. Reference state lives in storage
    * (swap it without restarting), nothing in the state store; the
    * per-batch work is one bounded histogram aggregation plus the
    * bin-universe statistic. */
  def driftStream(stream: DataFrame, refHist: DataFrame, groupCol: String, binCol: Column)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        sink(chiSquareBetweenHists(
          refHist, histogram(batch, groupCol, binCol), groupCol, "bin", "c"), id)
    }

  /** Shared statistic over an epoch-tagged histogram
    * `(groupCol, __e, __bin, __c)`. */
  private def fromTaggedHist(h: DataFrame, groupCol: String): DataFrame = {
    val wide = h
      .groupBy(col(groupCol), col("__bin"))
      .agg(sum(when(col("__e") === 0, col("__c")).otherwise(lit(0L))).as("na"),
        sum(when(col("__e") === 1, col("__c")).otherwise(lit(0L))).as("nb"))
    val w = Window.partitionBy(col(groupCol))
    val tot = wide
      .withColumn("ta", sum(col("na")).over(w))
      .withColumn("tb", sum(col("nb")).over(w))
    // Expected counts in doubles (BIGINT products would overflow past
    // ~3e9 rows per epoch); identical parenthesization to the oracle.
    val g = (col("ta") + col("tb")).cast(DoubleType)
    val ea = (col("na") + col("nb")).cast(DoubleType) * col("ta").cast(DoubleType) / g
    val eb = (col("na") + col("nb")).cast(DoubleType) * col("tb").cast(DoubleType) / g
    val contrib =
      (col("na") - ea) * (col("na") - ea) / ea + (col("nb") - eb) * (col("nb") - eb) / eb
    tot
      .filter(col("ta") > 0 && col("tb") > 0)
      .select(col(groupCol), floor(contrib * lit(Median.Scale)).cast(LongType).as("__cfp"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_bins"),
        (sum(col("__cfp")) / lit(Median.Scale)).as("chi2"))
  }

  /** Embedding distribution drift between two slices (old crawl vs new
    * crawl, embedding-model v1 vs v2): per-dimension exact fixed-point
    * means per slice and their IEEE delta — the vector-modality sibling
    * of [[chiSquareDrift]] (means, not histograms, because embedding
    * components are dense and roughly centered; a mean shift is the
    * model-swap signature). Components floor to 2^-20 fixed point BEFORE
    * aggregation (the classCentroids contract), so per-cell sums are
    * order-independent integers, each mean is one IEEE division, and the
    * delta one subtraction — bit-identical on any engine/partitioning.
    *
    * `slice` must take exactly the values "a" and "b"; dims missing from
    * a slice (impossible for fixed-width vectors) would drop via the
    * inner join rather than divide by zero.
    *
    * Scale shape: the posexplode fan-out partial-aggregates map-side, so
    * the one exchange carries ≤ 2 × dim cells per task — corpus rows
    * never shuffle; the pivot joins two dim-sized frames.
    * Output: (dim_idx, n_a, n_b, mu_a, mu_b, delta). */
  /** The per-dimension fixed-point stat frame `(dim_idx, n, sfp)` of one
    * embedding slice — the persistable unit behind
    * [[embeddingDriftBetween]] / [[embDriftStream]]. ADDITIVE count-store
    * algebra (the LM/NB convention, NOT the set stores'): disjoint
    * slices sum on read, so a reference corpus can accumulate
    * incrementally — but a REPLAYED slice double-counts; dedupe upstream
    * or rebuild, exactly as with LM counts. */
  def embStats(df: DataFrame, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("dim_idx", "comp")))
      .select(col("dim_idx"),
        floor(col("comp").cast(DoubleType) * lit(1048576.0))
          .cast(LongType).as("fp"))
      .groupBy(col("dim_idx"))
      .agg(count(lit(1)).as("n"), sum(col("fp")).as("sfp"))

  /** Persist a reference slice's per-dim stats. */
  def writeEmbStats(df: DataFrame, vecCol: String, path: String): Unit =
    embStats(df, vecCol).write.mode("overwrite").parquet(path)

  /** Accumulate one more (disjoint) slice into the reference. */
  def appendEmbStats(df: DataFrame, vecCol: String, path: String): Unit =
    embStats(df, vecCol).write.mode("append").parquet(path)

  /** Accumulate one slice TAGGED with a replay-stable batch id (a
    * Structured Streaming foreachBatch id, a pipeline run id) — the
    * ledger move that buys the additive store the SET stores'
    * replay-idempotence: a slice's stat rows are a pure function of the
    * slice, so a re-delivered batch rewrites byte-identical
    * (batch_id, dim_idx, n, sfp) rows that the read side's distinct
    * collapses, while two genuinely different batches always differ in
    * batch_id. Caller contract: ids are unique per logical batch and a
    * store mixes tagged OR untagged appends, never both (an untagged
    * store cannot tell a replay from a coincidence). */
  def appendEmbStats(df: DataFrame, vecCol: String, path: String, batchId: Long): Unit =
    StoreLedger.tag(embStats(df, vecCol), batchId)
      .write.mode("append").parquet(path)

  /** The reference stats ingested so far — slices sum on read (additive
    * merge), yielding the same frame [[embStats]] computes on the union
    * of the ingested slices. Tagged stores (the batch-id ledger) first
    * collapse re-delivered slices by distinct, so at-least-once replays
    * cannot double-count; the distinct runs on ≤ batches × dim ledger
    * rows, never data. */
  def readEmbStats(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    StoreLedger.collapse(spark.read.parquet(path))
      .groupBy(col("dim_idx"))
      .agg(sum(col("n")).as("n"), sum(col("sfp")).as("sfp"))
  }

  /** Drift between two pre-aggregated stat frames — the
    * reference-vs-current form ([[chiSquareBetweenHists]]'s embedding
    * sibling): the reference side is computed once and persisted; only
    * the current side touches data. Ref = the "a" columns. */
  def embeddingDriftBetween(ref: DataFrame, cur: DataFrame): DataFrame = {
    def means(stats: DataFrame, suffix: String) = stats
      .groupBy(col("dim_idx"))
      .agg(sum(col("n")).as(s"n$suffix"), sum(col("sfp")).as("__s"))
      .select(col("dim_idx"), col(s"n$suffix"),
        (col("__s").cast(DoubleType) /
          (col(s"n$suffix") * lit(1048576L)).cast(DoubleType)).as(s"mu$suffix"))
    means(ref, "_a").join(means(cur, "_b"), "dim_idx")
      .select(col("dim_idx"), col("n_a"), col("n_b"), col("mu_a"), col("mu_b"),
        (col("mu_a") - col("mu_b")).as("delta"))
  }

  /** Per-micro-batch embedding-drift alerting against a PERSISTED
    * reference ([[driftStream]]'s embedding sibling): each batch's stats
    * score against `refStats` and the per-dim drift frame goes to
    * `sink`. Reference state lives in storage (swap or accumulate via
    * [[appendEmbStats]] without restarting); per-batch work is one
    * bounded ≤2×dim-cell aggregation + a dim-sized join. */
  def embDriftStream(stream: DataFrame, refStats: DataFrame, vecCol: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        sink(embeddingDriftBetween(refStats, embStats(batch, vecCol)), id)
    }

  def embeddingDrift(df: DataFrame, slice: Column, vecCol: String): DataFrame = {
    val cells = df
      .filter(col(vecCol).isNotNull)
      .select(slice.as("slice"),
        posexplode(col(vecCol)).as(Seq("dim_idx", "comp")))
      .select(col("slice"), col("dim_idx"),
        floor(col("comp").cast(DoubleType) * lit(1048576.0))
          .cast(LongType).as("fp"))
      .groupBy(col("slice"), col("dim_idx"))
      .agg(count(lit(1)).as("n"), sum(col("fp")).as("sfp"))
      .select(col("slice"), col("dim_idx"), col("n"),
        (col("sfp").cast(DoubleType) /
          (col("n") * lit(1048576L)).cast(DoubleType)).as("mu"))
    cells.filter(col("slice") === "a")
      .select(col("dim_idx"), col("n").as("n_a"), col("mu").as("mu_a"))
      .join(cells.filter(col("slice") === "b")
        .select(col("dim_idx"), col("n").as("n_b"), col("mu").as("mu_b")),
        "dim_idx")
      .select(col("dim_idx"), col("n_a"), col("n_b"), col("mu_a"), col("mu_b"),
        (col("mu_a") - col("mu_b")).as("delta"))
  }
}
