package graft.functions

import org.apache.spark.sql.DataFrame

/**
 * Parallelism guard for expensive per-row kernel stages.
 *
 * A parquet row group is the unit of scan parallelism — Spark assigns each
 * row group to the file split holding its midpoint, so a compressed
 * single-row-group file scans as ONE task no matter how many splits or
 * executor threads exist. Any expensive narrow stage fused onto such a scan
 * (md5/XXH64 shingle signatures, dot products, image decode) then runs
 * single-threaded while the rest of the machine idles.
 *
 * [[ensureParallelism]] redistributes the (cheap, raw) input across the
 * session's default parallelism BEFORE the kernel stage — the shuffle
 * carries the raw rows, which for these pipelines are far smaller than the
 * kernel outputs they fan out into. When the scan already provides enough
 * partitions (the 100 TB case: thousands of files × row groups), it is a
 * no-op and the plan keeps its shuffle-free shape.
 */
object KernelInput {

  /** Repartition `df` to the session default parallelism iff its current
    * partitioning can't keep the machine busy (fewer than half the default
    * parallelism). Call on the RAW input of an expensive kernel stage, not
    * on kernel output.
    *
    * Precondition (enforced): `df` must be a batch scan-only plan —
    * scans/filters/projections, nothing shuffle-introducing. For such plans
    * `df.rdd.getNumPartitions` only triggers file listing; with a shuffle in
    * the plan, materializing the RDD under AQE would eagerly run every
    * upstream query stage (real jobs), and on a streaming frame it throws. */
  def ensureParallelism(df: DataFrame): DataFrame = {
    require(!df.isStreaming,
      "ensureParallelism reads the batch scan's partition count; on a stream " +
        "the source governs parallelism — call it on the batch side instead.")
    df.queryExecution.logical.foreach {
      case p if !scanShape(p) =>
        throw new IllegalArgumentException(
          s"ensureParallelism requires a scan-only input plan (its partition " +
            s"probe would otherwise run real jobs under AQE); found ${p.nodeName}")
      case _ => ()
    }
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target)
  }

  /** [[ensureParallelism]] when the input is a batch scan-only plan;
    * identity otherwise. For COMPOSED inputs — a gated/joined frame, a
    * foreachBatch micro-batch — the row-group starvation the guard exists
    * for can't occur: the plan has already crossed a shuffle (parallelism =
    * shuffle.partitions) or a streaming source governs its splits, and the
    * strict probe would run real jobs under AQE (or throw on a stream).
    * Operator builders that accept arbitrary frames (Dedup's index/signature
    * pipelines) use this form; direct raw-scan call sites keep the strict
    * contract. */
  def ensureParallelismIfScan(df: DataFrame): DataFrame = {
    val scanOnly = !df.isStreaming && {
      var ok = true
      df.queryExecution.logical.foreach(p => if (!scanShape(p)) ok = false)
      ok
    }
    if (scanOnly) ensureParallelism(df) else df
  }

  // WHITELIST, not a blacklist: anything outside the narrow scan shapes
  // (leaf, filter, project, alias) is rejected — a blacklist of known
  // shuffle operators would silently miss Except/Intersect/Limit/CTE
  // nodes and re-introduce the eager-job failure the guard exists for.
  private def scanShape(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: LeafNode | _: Filter | _: Project | _: SubqueryAlias => true
      case _ => false
    }
  }
}
