package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan regression gate: the scale properties the queries are
 * designed around (pushdown, broadcasts, no nested-loop joins, top-k
 * shape) are asserted here so a plan regression fails `sbt test` instead
 * of quietly degrading BENCH.
 */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def planString(name: String): String = plan(name).toString

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val expanded = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    (p +: expanded).flatMap(_.collect(pf))
  }

  test("q2_filter: predicates and projection reach the parquet scan") {
    val s = planString("q2_filter")
    assert(s.contains("PushedFilters: ["), s)
    assert(s.contains("l_quantity"), s)
    // Pruned read schema: none of the unused wide columns appear.
    assert(!s.contains("l_comment"), s)
  }

  test("q3_join_agg: dimension join is broadcast, not shuffled") {
    val bhj = collectAll(plan("q3_join_agg")) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, planString("q3_join_agg"))
  }

  test("q17_tpch5: supplier/nation/region joins all broadcast") {
    val bhj = collectAll(plan("q17_tpch5")) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 3, planString("q17_tpch5"))
  }

  test("q4_topk: plans TakeOrderedAndProject, not a global sort") {
    assert(planString("q4_topk").contains("TakeOrderedAndProject"))
  }

  // Queries allowed a nested-loop join, each with a bounded build side:
  //  - ann_topk: the self-exclusion predicate (vec_id =!= query_id) is
  //    non-equi, and the broadcast side is the tiny query set — a
  //    broadcast-NLJ is the intended plan.
  //  - q14_subq: uncorrelated scalar subquery modeled as a cross join
  //    against a broadcast 1-row aggregate — the build side is exactly one
  //    row at any corpus scale.
  //  - tfidf_topk: same 1-row broadcast shape (the corpus-size aggregate
  //    joined onto every (doc, word) row).
  //  - pack_sequences / pipeline_train_prep: the packer's top prefix-sum
  //    level is a broadcast non-equi join over SUPERBUCKET totals —
  //    n/2^20 rows (~10k at 10^10 docs), the metadata-scale terminator
  //    that keeps every window partitioned.
  //  - lm_coverage: same 1-row broadcast shape — the top-64 reference
  //    trigram array joined onto every document row.
  //  - corpus_mix / corpus_upsample: same 1-row broadcast shape — the
  //    corpus-wide aggregate (sum weights / max count) joined onto the
  //    per-stratum rows (both sides are stratum-cardinality metadata; the
  //    corpus itself is not involved).
  //  - neg_sample: the 1-row corpus count broadcast onto every anchor
  //    (the q14_subq shape) — the draws' mod-n needs it.
  //  - q34_gapfill: the spine x types grid is a cross join by definition;
  //    both sides are metadata-scale (hour buckets x enum event types),
  //    and the corpus side is aggregated before either is built.
  // (dsir_select is NOT exempt: its fit cross-joins run eagerly at
  // construction and never appear in the gated selection plan, so the
  // gate still protects that plan from a future real nested loop.)
  //  - bm25_topk / bm25_retract: the 1-row (N, sum dl) corpus aggregate
  //    broadcast onto the per-(doc, term) tf rows — the
  //    q14_subq/tfidf_topk shape (bm25_retract reads the same stats row
  //    as a net sum over the log store's ledgered deltas).
  //  - fk_audit: four 1-row aggregates cross-combined metadata-side (the
  //    corpus-scale work — the anti joins — happens below them as equi
  //    joins).
  //  - pca_power_k3: each chained round cross-joins the previous round's
  //    direction — a ONE-ROW broadcast (the dim-array packed by a global
  //    aggregate) — onto the corpus pass; the q14_subq shape, per round.
  //  - knn_classify: the brute top-k face underneath is ann_topk's
  //    broadcast-NLJ (tiny query set, non-equi self-exclusion); the vote
  //    stages above it are equi-only.
  //  - rrf_hybrid: the semantic list underneath is ann_topk's
  //    broadcast-NLJ (one-query broadcast, non-equi self-exclusion), and
  //    the lexical list carries bm25_topk's 1-row stats broadcast; the
  //    fusion itself is union + equi-aggregation, join-free.
  //  - nb_confusion: the per-doc stats x CLASS-frame cross join is an
  //    explicit broadcast of label-cardinality rows — metadata-scale by
  //    construction (language inventory, not corpus statistics); the
  //    corpus-scale work (token-count training, matched-hit scoring) is
  //    equi-joins below it.
  //  - stump_split: the zero-fill grid is distinct-bins x distinct-labels
  //    (the q34_gapfill spine shape) — both sides metadata-scale
  //    aggregates; the corpus folds in the (bin, label) groupBy below.
  //  - pmi_topk: the 1-row transition total broadcast onto the pair
  //    frame (the q14_subq/bm25_topk shape); marginals join as equi.
  //  - ann_recall: composes ann_topk (whitelisted broadcast-NLJ brute
  //    face) with ann_ivf; the recall join itself is equi and bounded.
  private val nljWhitelist =
    Set("ann_topk", "ann_sq8", "knn_classify", "nb_confusion", "rrf_hybrid", "q14_subq", "tfidf_topk", "pack_sequences", "pack_bpe", "pipeline_train_prep",
      "corpus_mix", "corpus_upsample", "mix_report", "token_budget", "neg_sample",
      "q34_gapfill", "bm25_topk", "fk_audit", "pca_power_k3", "stump_split",
      "stump_chain", "pmi_topk", "ann_recall", "ann_recall_ivfpq",
      // ann_sq8_store: the SQ8 candidate scan's self-exclusion
      // (vec_id =!= query_id) is non-equi with the tiny query set
      // broadcast — the ann_sq8 shape off the persisted code table.
      "ann_recall_sq8", "ann_recall_lsh", "ann_sq8_store", "bm25_retract",
      // ann_recall_filtered: the filtered exact side is ann_topk's
      // broadcast-NLJ brute face over the predicate's survivors.
      // ann_filtered_auto: at gate SF the strategy switch picks the
      // brute arm (survivors under the absolute-rows threshold) — the
      // same bounded broadcast-NLJ shape, by design.
      "ann_recall_filtered", "ann_filtered_auto",
      // ann_recall_filtered_pq: same filtered exact brute side as
      // ann_recall_filtered (the PQ approx side is all equi-joins).
      "ann_recall_filtered_pq")

  test("no nested-loop/cartesian joins anywhere in the production query map") {
    for (q <- SparkEntry.queries.keys.toSeq.sorted if !nljWhitelist(q)) {
      val bad = collectAll(plan(q)) {
        case c: CartesianProductExec => c
        case b: BroadcastNestedLoopJoinExec => b
      }
      assert(bad.isEmpty, s"$q has a nested-loop join:\n${planString(q)}")
    }
  }

  test("ann_filtered: the metadata predicate reaches the corpus parquet scan") {
    // Filtered search's scale contract: the label predicate composes
    // with cell pruning AT THE SCAN (selectivities multiply), never as a
    // post-join filter over unfiltered candidates.
    assert(planString("ann_filtered").contains("EqualTo(label,1)"))
  }

  test("ann_filtered_store: file pruning (cells) and row-group pushdown (label) compose on one scan") {
    val p = planString("ann_filtered_store")
    assert(p.contains("EqualTo(label,1)"), "label predicate must push to the store scan")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      "probed cells must prune partitions, not filter rows")
  }

  test("ann_filtered_pq: cell pruning and label pushdown compose on the COMPRESSED scan") {
    // The round-15 closure: the predicate must land on the PQ store's
    // partition-pruned code scan itself (the v4 layout carries label
    // cell-clustered) — never as a post-join filter, and never by
    // demoting the query to the ~50×-larger full-vector layout.
    val p = planString("ann_filtered_pq")
    assert(p.contains("EqualTo(label,1)"), "label predicate must push to the code scan")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      "probed cells must prune partitions of the compressed index")
  }

  test("vocab_topk: bounded TakeOrderedAndProject, never a global sort of the vocab") {
    assert(planString("vocab_topk").contains("TakeOrderedAndProject"))
  }

  test("bpe_pairs: bounded top-k over the pair counts, never a global sort") {
    assert(planString("bpe_pairs").contains("TakeOrderedAndProject"))
  }

  test("bpe_pairs: the regex tokenizer runs exactly once (no inferred scan filter)") {
    // The InferFiltersFromGenerate hazard: an inferred size(...) > 0
    // pushed into the scan would re-run regexp_extract_all over every
    // document. This generator shape doesn't trigger it today; the gate
    // keeps a future optimizer or query change from reintroducing it.
    val occurrences = "regexp_extract_all".r
      .findAllIn(SparkEntry.queries("bpe_pairs")(spark, sf)
        .queryExecution.optimizedPlan.toString).size
    assert(occurrences === 1)
  }

  test("q32_lateral: LATERAL decorrelates to WindowGroupLimit, not a join-per-row") {
    // The correlated ORDER BY + LIMIT must become the rank-based group
    // top-k (with its map-side partial pruning), never a nested-loop
    // re-execution of the subquery per outer row.
    assert(planString("q32_lateral").contains("WindowGroupLimit"))
  }

  test("semdedup: merge-hinted cell self-join; k-dot assignment planned once") {
    val df = SparkEntry.queries("semdedup")(spark, sf)
    val smj = collectAll(df.queryExecution.executedPlan) {
      case j: SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, "within-cell pair join must be a shuffle equi join on the cell id")
    // AQE finalizes exchange reuse at materialization: after running, the
    // self-join's second assignment subtree must ride a ReusedExchange —
    // the corpus pays the k dot kernels (and the cell shuffle) ONCE.
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      df.queryExecution.executedPlan.toString)
  }

  test("tfidf_topk: the Zipf-skewed tf<->df join stays an AQE-splittable equi join") {
    // Word document-frequency is Zipfian: stopwords concentrate O(corpus)
    // tf rows on single join keys, so at scale the tf <-> dfreq join gets
    // one monster partition per stopword. The defense is AQE skew-join
    // splitting, which (a) must be enabled and (b) only applies to shuffle
    // equi-joins (sort-merge / shuffled-hash) — so with broadcast taken
    // off the table, the join must plan as one of those, never a nested
    // loop. At sf0.01 AQE broadcasts dfreq instead, which is also fine —
    // skew splitting matters on the 100 TB path where vocab outgrows the
    // broadcast threshold. (vocab_topk has no join: its stopword skew is
    // absorbed by map-side partial aggregation.)
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("tfidf_topk")
      val equiShuffleJoins = collectAll(p) {
        case j: SortMergeJoinExec => j
        case j: ShuffledHashJoinExec => j
      }
      assert(equiShuffleJoins.nonEmpty, p.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("no unpartitioned window anywhere in the production query map") {
    // An unpartitioned window funnels the whole frame through ONE task —
    // linear in the corpus at scale (WindowExec's own "No Partition
    // Defined" warning). Prefix-style computations must contract through
    // partitioned levels instead (see pack_sequences).
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- SparkEntry.queries.keys.toSeq.sorted) {
      val bad = collectAll(plan(q)) { case w: WindowExec if w.partitionSpec.isEmpty => w }
      // One documented exception class: a GLOBAL distribution-rank
      // selection (dsir_select) has no grouping column, so the constant
      // group folds out of Ranks.distributionRanks' bin-frame windows and
      // they plan as unpartitioned. That is still the metadata-scale
      // shape: the window input is the BIN-COUNT frame (<= one row per
      // occupied score bin), never corpus rows — asserted structurally by
      // requiring every such window to consume only bin-frame columns.
      val corpusScale =
        if (q != "dsir_select" && q != "batch_plan") bad
        else bad.filterNot(_.child.output.forall(a => a.name.startsWith("__") || a.name == "1"))
      assert(corpusScale.isEmpty, s"$q has an unpartitioned window:\n${planString(q)}")
    }
  }

  test("median gates carry no exact Percentile aggregate (O(group) buffer at scale)") {
    // Spark's exact `percentile` materializes a value->count map per group
    // in ONE aggregation buffer; over a continuous double score that is
    // O(group rows) of heap on a single executor. The median gates must
    // use the bounded binned median (graft.functions.Median) instead.
    // (q24_quantiles keeps the built-in deliberately: its column is a
    // bounded INTEGER, so the buffer is bounded by the value universe.)
    for (q <- Seq("quality_gate", "pipeline_train_prep")) {
      val s = planString(q).toLowerCase
      assert(!s.contains("percentile"), s"$q still plans an exact percentile:\n$s")
    }
  }

  test("dedup_exact: no exchange carries document text (hash-first shuffle)") {
    val shuffles = collectAll(plan("dedup_exact")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, planString("dedup_exact"))
    for (e <- shuffles)
      assert(!e.output.exists(_.name == "text"),
        s"exchange carries document text:\n$e")
  }

  test("LM family: no exchange carries document text (tokens only past the scan)") {
    // The transition stream projects (id, prev, cur) before anything
    // shuffles: exchanges carry short tokens and integer bits, never the
    // full text column — the dedup_exact posture for the LM scorer.
    for (q <- Seq("lm_bigrams", "lm_surprisal", "lm3_surprisal", "lm_report")) {
      val shuffles = collectAll(plan(q)) { case e: ShuffleExchangeExec => e }
      for (e <- shuffles)
        assert(!e.output.exists(_.name == "text"),
          s"$q: exchange carries document text: $e")
    }
  }

  test("token_entropy: no keyed shuffle — scan + kernel projection only") {
    // The kernel keeps per-doc token counts inside the projection; a
    // (doc, token)-keyed exchange appearing here means the explode+groupBy
    // form snuck back in. The one allowed exchange is KernelInput's
    // round-robin parallelism guard (a no-op on multi-row-group input —
    // the 100 TB case).
    val keyed = collectAll(plan("token_entropy")) {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.toString.contains("RoundRobinPartitioning") => e
    }
    assert(keyed.isEmpty, planString("token_entropy"))
  }

  test("link_predict: bounded top-k over the edge store, no in-plan copresence build") {
    val df = SparkEntry.queries("link_predict")(spark, sf)
    val s0 = df.queryExecution.executedPlan.toString
    assert(s0.contains("TakeOrderedAndProject"), s0)
    // The edge set comes from the persisted store (the corpus-sized
    // basket self-join is paid at store write, once per generation), so
    // the plan reads the store parquet and never scans lineitem. The
    // wedge self-join's sides are both derived from that scan; at this
    // scale AQE broadcasts one side (at store scale it shuffle-joins and
    // the shared subtree rides a ReusedExchange — both are the bounded
    // shape; what's gated here is the absence of the corpus build).
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("graft-copresence"), s)
    assert(!s.contains("lineitem"), s)
  }

  test("overlap_matrix: keyed exchanges carry hashed grams and sources, never text") {
    // KernelInput's round-robin parallelism guard may redistribute the
    // raw scan (no-op on multi-row-group input); every KEYED exchange
    // must carry hashes only.
    val keyed = collectAll(plan("overlap_matrix")) {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.toString.contains("RoundRobinPartitioning") => e
    }
    assert(keyed.nonEmpty, planString("overlap_matrix"))
    for (e <- keyed)
      assert(!e.output.exists(a => a.name == "text" || a.name == "tk"),
        s"overlap_matrix: exchange carries text:\n$e")
  }

  test("overlap_matrix: the gram kernel pipeline plans once (shared h-exchange)") {
    // The explicit repartition on the gram hash is the neighborFrame
    // subset-partitioning move: with broadcast off (the 100 TB shape),
    // the pair self-join must ride ONE exchange of the kernel pipeline
    // (ReusedExchange at materialization), never two kernel scans.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("overlap_matrix")(spark, sf)
      df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
        df.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("heavy_hitters: exact top and CMS table share ONE tokenize pass (reused exchange)") {
    // The r12 bench regression closed round 13: the sketch builds from
    // the word-count inventory (cell-identical by the distributive sum),
    // so the corpus-scale tokenize + word aggregation plans once and the
    // second consumer rides a ReusedExchange — never two kernel scans
    // (1.24 s -> 0.61 s scoped at sf0.1).
    val df = SparkEntry.queries("heavy_hitters")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      df.queryExecution.executedPlan.toString)
  }

  test("every production query has an oracle (the driver's correctness gate covers the full map)") {
    // A queries entry without oracleSql silently downgrades to a weaker
    // rows-only driver check; an oracle without a query never runs at all.
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet,
      s"only in queries: ${SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)}; " +
        s"only in oracleSql: ${SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)}")
  }

  test("bm25_topk: bounded TakeOrderedAndProject, never a global sort of the scored set") {
    assert(planString("bm25_topk").contains("TakeOrderedAndProject"))
  }

  test("bloom_decontaminate: no data-dependent exchange carries document text") {
    // The one exchange allowed to carry text is KernelInput's round-robin
    // parallelism guard on the raw scan (identity at production scale,
    // where the scan itself provides the partitions). Every HASH exchange
    // — the ones that exist at 100 TB — must carry only bloom-thinned
    // (doc_id, sh) rows.
    val shuffles = collectAll(plan("bloom_decontaminate")) {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.toString.contains("RoundRobinPartitioning") => e
    }
    for (e <- shuffles)
      assert(!e.output.exists(_.name == "text"),
        s"exchange carries document text:\n$e")
  }

  test("anomaly_mad: corpus rows never shuffle (only histogram bins and the broadcast gate move)") {
    // The flagging pass must be narrow: event rows ride a broadcast join;
    // the only exchanges belong to the bin-universe histogram/median
    // machinery, which never carries event_id or the raw value.
    val shuffles = collectAll(plan("anomaly_mad")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, planString("anomaly_mad"))
    for (e <- shuffles)
      assert(!e.output.exists(a => a.name == "event_id" || a.name == "value"),
        s"exchange carries corpus rows:\n$e")
  }

  test("zorder_layout: one aggregation shuffle; the bit interleave stays narrow") {
    val shuffles = collectAll(plan("zorder_layout")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1, planString("zorder_layout"))
  }

  test("winsorize: corpus values never shuffle (histogram bins + broadcast clip bounds only)") {
    val shuffles = collectAll(plan("winsorize")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, planString("winsorize"))
    for (e <- shuffles)
      assert(!e.output.exists(_.name == "value"),
        s"exchange carries raw values:\n$e")
  }

  test("fk_audit: the anti joins are equi joins on projected keys, never wide rows") {
    // The only nested loops allowed are the 1-row stat combines
    // (whitelisted); the key-matching itself must be AQE-plannable equi
    // anti joins, and no exchange may carry a non-key lineitem column.
    val p = plan("fk_audit")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    for (e <- shuffles; a <- e.output)
      assert(a.name.startsWith("__") || a.name.startsWith("n_") ||
        a.name.startsWith("count") || a.name.startsWith("sum"),
        s"fk_audit exchange carries unexpected column ${a.name}:\n$e")
  }

  test("heavy_hitters: bounded top-k probe set; the sketch probe is a broadcast join") {
    val p = plan("heavy_hitters")
    assert(p.toString.contains("TakeOrderedAndProject"), p.toString)
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, p.toString)
  }

  test("dist_drift: corpus rows collapse in the first aggregation (no doc columns in any exchange)") {
    // Everything after the (group, epoch, bin) histogram is
    // bin-universe-sized; a doc_id / text / raw score in an exchange would
    // mean the chi-square machinery is paying corpus scale.
    val shuffles = collectAll(plan("dist_drift")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, planString("dist_drift"))
    for (e <- shuffles)
      assert(!e.output.exists(a => a.name == "doc_id" || a.name == "text" || a.name == "__q"),
        s"exchange carries corpus rows:\n$e")
  }

  test("q28_notin plans the null-aware anti join, not a nested loop") {
    // NOT IN needs null-aware semantics; Spark supports NAAJ only as a
    // broadcast hash join (the trailing isNullAwareAntiJoin=true). A
    // regression to BroadcastNestedLoopJoin would be O(n*m) at scale.
    val bhj = collectAll(plan("q28_notin")) {
      case b: BroadcastHashJoinExec if b.isNullAwareAntiJoin => b
    }
    assert(bhj.nonEmpty, planString("q28_notin"))
  }

  test("span queries: decisions are hash-only; span text only ever shuffles on the doc id") {
    // The digest-keyed decision exchanges (dedup window / boilerplate
    // count-distinct + anti-join) must never carry span text — only the
    // reassembly join/group-by, keyed by doc_id, may. And the raw document
    // text column must not appear in ANY exchange (the spans explode is
    // fused into the scan side).
    for (q <- Seq("span_dedup", "boilerplate_strip")) {
      val shuffles = collectAll(plan(q)) { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, planString(q))
      for (e <- shuffles) {
        assert(!e.output.exists(_.name == "text"),
          s"$q: exchange carries raw document text:\n$e")
        if (e.output.exists(_.name == "span"))
          assert(e.outputPartitioning.toString.contains("doc_id"),
            s"$q: span text in a non-reassembly exchange:\n$e")
      }
    }
  }

  test("stump_confusion: scoring is a literal CASE projection — no join in the plan") {
    // The trained list is 3 driver-side literal rows, so the SCORING plan
    // (the returned frame; training ran in earlier jobs) must be scan +
    // codegen'd CASE + one map-side-combining aggregation — any join node
    // here means a model frame leaked into the scoring path.
    val p = plan("stump_confusion")
    val joins = collectAll(p) {
      case j: BroadcastHashJoinExec => j: SparkPlan
      case j: SortMergeJoinExec => j: SparkPlan
      case j: ShuffledHashJoinExec => j: SparkPlan
      case j: BroadcastNestedLoopJoinExec => j: SparkPlan
      case j: CartesianProductExec => j: SparkPlan
    }
    assert(joins.isEmpty, planString("stump_confusion"))
  }

  test("mixing queries: the corpus never shuffles (only per-stratum count rows move)") {
    for (q <- Seq("corpus_mix", "corpus_upsample")) {
      val shuffles = collectAll(plan(q)) { case e: ShuffleExchangeExec => e }
      for (e <- shuffles)
        assert(!e.output.exists(a => a.name == "doc_id" || a.name == "text"),
          s"$q: exchange carries corpus rows:\n$e")
    }
  }

  test("dsir_select: the bigram hash materializes exactly once per corpus pass") {
    // Three hazards, one gate. (a) The bucket equi-uses' inferred
    // isnotnull(b) constraint would plan a Filter recomputing the md5
    // bucket expression above every Generate — the non-nullable coalesce
    // wrapper folds it away. (b) The fit totals re-derive the count
    // subtrees — ReusedExchange must collapse them. (c) The selection's
    // ranks consume the scored frame twice (corpus branch + bin-count
    // branch): with the weight table as a LITERAL and the scoring
    // aggregate reduced to (doc_id, score) the two subtrees are
    // canonically identical and AQE stage reuse collapses them to ONE
    // materialized scoring pass. Both halves were measured necessary: the
    // join form's asymmetric broadcast reuse defeats the stage cache, and
    // an extra n_bigrams count gets column-pruned out of the bin-count
    // branch only, de-canonicalizing the pair — either way the corpus
    // paid the hash twice. The fit passes run eagerly at construction
    // (bounded aggregations, the lm_coverage convention), so the
    // selection plan itself must materialize the hash exactly ONCE. AQE
    // finalizes reuse at materialization (the semdedup lesson), so run
    // first and count md5 sites in the FINAL plan only.
    val df = SparkEntry.queries("dsir_select")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val occurrences = "md5".r.findAllIn(s).size
    assert(occurrences === 1, s"expected 1 materialized md5 site (the single scoring pass), got $occurrences:\n$s")
    assert(s.contains("ReusedExchange"), s)
  }

  test("dsir_select: no exchange carries text or bigram strings") {
    // The weight table rides as a literal (metadata-scale by
    // construction); corpus text and raw bigram strings must never enter
    // an exchange — only (bucket, count) fit rows and per-doc partial
    // sums move.
    val p = plan("dsir_select")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, planString("dsir_select"))
    for (e <- shuffles)
      assert(!e.output.exists(a => a.name == "text" || a.name == "bg"),
        s"dsir_select: exchange carries corpus text/bigrams:\n$e")
  }

  test("narrow pipeline stages plan zero shuffles") {
    // Pure per-row stages (split assignment, PII scrub, repetition ratio,
    // codec metadata) must stay narrow: a shuffle here would cost a full
    // corpus pass at 100 TB for no semantic reason.
    for (q <- Seq("sample_split", "redact_pii", "quality_repeat", "mm_audio", "mm_meta",
        "repetition_strip", "ej_nested")) {
      val shuffles = collectAll(plan(q)) { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"$q shuffles:\n${planString(q)}")
    }
  }

  test("sessionize: exactly one shuffle (window partitioning reused by the groupBy)") {
    val shuffles = collectAll(plan("sessionize")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, planString("sessionize"))
  }

  test("funnel_conv: both cascaded funnel windows share ONE corpus shuffle") {
    // The two "seen so far" windows partition on the same (user_id)
    // ordering, so the event stream must cross exactly one hash exchange;
    // the remaining exchanges belong to the metadata-scale countDistinct
    // tail (expand + single-partition final), never the corpus.
    val shuffles = collectAll(plan("funnel_conv")) { case e: ShuffleExchangeExec => e }
    // A bare hashpartitioning(user_id#…) is the corpus shuffle; the
    // countDistinct tail's expand exchange mentions user_id only inside
    // CASE projections of already-aggregated rows.
    val corpus = shuffles.filter(_.outputPartitioning.toString.startsWith("hashpartitioning(user_id#"))
    assert(corpus.size == 1, planString("funnel_conv"))
  }

  test("funnel_by_cohort: flag windows + per-user rollup ride one user_id exchange") {
    // Consecutive windows and the groupBy(user_id) all require the same
    // partitioning: exactly one bare user_id exchange may exist; the only
    // other shuffle is the calendar-scale cohort rollup.
    val shuffles = collectAll(plan("funnel_by_cohort")) { case e: ShuffleExchangeExec => e }
    val corpus = shuffles.filter(_.outputPartitioning.toString.startsWith("hashpartitioning(user_id#"))
    assert(corpus.size == 1, planString("funnel_by_cohort"))
    assert(shuffles.size <= 2, planString("funnel_by_cohort"))
  }

  test("cohort_retention: exactly two shuffles (per-user days, then cohort cells)") {
    val shuffles = collectAll(plan("cohort_retention")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 2, planString("cohort_retention"))
  }

  test("q35_frames: one partitioned window exchange, no funnel") {
    val shuffles = collectAll(plan("q35_frames")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, planString("q35_frames"))
    // Partitioned by customer — never a global single-partition window.
    assert(!planString("q35_frames").contains("SinglePartition"), planString("q35_frames"))
  }

  test("ann_ivf: corpus is never hash-shuffled (map-side cells, broadcast probes)") {
    val plan = planString("ann_ivf")
    // The only hash exchange allowed is the partial top-k groupBy on
    // query_id; cell assignment is a projection and the probe side is a
    // broadcast.
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("ann_ivfpq: compressed-index shape — floats stay out of every hash exchange") {
    val p = plan("ann_ivfpq")
    // Two bounded partial-top-k groupBys (ADC candidates, exact re-rank)
    // are the only hash exchanges; probe and candidate sets ride
    // broadcasts. No HASH exchange may carry a vector/reconstruction/
    // codes column — the index-scan side must collapse to (query_id,
    // vec_id, score) partials before anything co-locates by key. The one
    // permitted round-robin exchange is widenForKernels' sub-parallelism
    // widen over the gate corpus's single-file scan — it fires ONLY when
    // the scan is narrower than session parallelism (the pass-through
    // case is spec-pinned in SimilaritySpec), so at warehouse scale no
    // exchange carries vectors at all.
    val ps = p.toString
    assert(ps.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2, ps)
    assert(ps.contains("BroadcastExchange"), ps)
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    for (e <- shuffles
         if e.outputPartitioning.isInstanceOf[
           org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
      assert(!e.output.exists(a => Set("v", "qv", "rv", "codes", "embedding")(a.name)),
        s"hash exchange carries vector data:\n$e")
    val rr = shuffles.filter(_.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
    assert(rr.size <= 1, s"more than one round-robin widen:\n$ps")
  }

  test("bpe_apply/bpe_encode/bpe_decode: merge table and vocab as literals; the passes are shuffle-free") {
    // learnBpeMerges / the vocab ranking collect their metadata BEFORE
    // the plan exists (the IVF-centroid posture); the tokenizer,
    // encode, and decode stages themselves must be narrow map-side
    // passes — a shuffle here would re-pay the corpus at every
    // tokenization.
    for (q <- Seq("bpe_apply", "bpe_encode", "bpe_decode")) {
      val shuffles = collectAll(plan(q)) { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"$q:\n" + planString(q))
    }
  }

  test("lm_coverage: the corpus never hash-shuffles (doc rows stay out of keyed exchanges)") {
    // The reference table collapses to one broadcast array row, so the
    // only KEYED exchanges belong to the tiny reference-side aggregation;
    // a doc_id in any hash exchange would mean the corpus pass lost its
    // narrow shape (the explode+join formulation this replaced shuffled
    // one row per document). The single permitted round-robin exchange is
    // the KernelInput widen of the one-file gate scan (a no-op at
    // warehouse scale) — the PQ-family pin draws the same distinction.
    val shuffles = collectAll(plan("lm_coverage")) { case e: ShuffleExchangeExec => e }
    for (e <- shuffles if !e.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
      assert(!e.output.exists(a => a.name == "doc_id" || a.name == "text"),
        s"keyed exchange carries corpus rows:\n$e")
  }

  test("kmeans_step: corpus is never hash-shuffled; only (cell, dim) partials move") {
    // Assignment is k literal-centroid kernels fused into the scan; the
    // single allowed exchange is the k x dim partial-aggregate combine.
    val p = planString("kmeans_step")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, p)
    assert(!p.contains("Exchange hashpartitioning(v"), p)
  }

  test("class_centroids: one exchange, carrying (label, dim) partials — never components") {
    // The posexplode fan-out partial-aggregates map-side, so the single
    // combine exchange moves at most |classes| x dim cells per task; a
    // raw component (comp / fp) in any exchange would mean the corpus
    // rides the shuffle (the kmeans_step contract, labeled).
    val shuffles = collectAll(plan("class_centroids")) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 1, planString("class_centroids"))
    for (e <- shuffles)
      assert(!e.output.exists(a => Set("comp", "fp", "embedding")(a.name)),
        s"exchange carries raw components: $e")
  }

  test("q34_gapfill: only aggregated hourly rows ever shuffle (the corpus moves once)") {
    // The spine/types/fill machinery must all run over the AGGREGATED
    // frame: raw event columns in any exchange would mean the corpus is
    // paying for the metadata-scale grid.
    val shuffles = collectAll(plan("q34_gapfill")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, planString("q34_gapfill"))
    for (e <- shuffles)
      assert(!e.output.exists(a => a.name == "event_id" || a.name == "value" || a.name == "props"),
        s"exchange carries raw event rows:\n$e")
  }

  test("q33_unpivot: melt is a narrow Expand over the aggregate (no post-agg shuffle)") {
    assert(planString("q33_unpivot").contains("Expand"))
  }

  test("ann_topk: queries side is broadcast; corpus is never shuffled pre-aggregation") {
    val p = plan("ann_topk")
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    val nlj = collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }
    // The self-exclusion predicate (vec_id =!= query_id) makes this a
    // broadcast nested-loop by necessity (non-equi condition); what must
    // NOT happen is a shuffle of the corpus before the partial top-k agg.
    assert(bhj.nonEmpty || nlj.nonEmpty, p.toString)
  }

  test("compact_log: the shuffle carries compacted structs, never raw log rows") {
    // max(struct) must partial-aggregate map-side: the single exchange's
    // input is one (key, max-buffer, count-buffer) row per key per map
    // partition, so the raw version/payload columns never move.
    val shuffles = collectAll(plan("compact_log")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size === 1, planString("compact_log"))
    val names = shuffles.head.output.map(_.name)
    assert(names.exists(_.startsWith("max")), s"no partial-max buffer in exchange: $names")
    assert(!names.contains("ts") && !names.contains("value"),
      s"compact_log exchange carries raw log columns: $names")
  }

  test("corr_matrix / ols_fit: the corpus folds before any exchange — only moment buffers move") {
    // Both reduce the frame to exact integer moments map-side; every
    // exchange must carry aggregation buffers (sum/count/isEmpty [+ the
    // group key]), never the scored or scanned corpus columns.
    val corpusCols = Set("l_quantity", "l_extendedprice", "l_discount",
      "text", "n_chars", "qfp", "doc_id")
    for (q <- Seq("corr_matrix", "ols_fit")) {
      val shuffles = collectAll(plan(q)) { case e: ShuffleExchangeExec => e }
      assert(shuffles.size === 1, planString(q))
      val names = shuffles.head.output.map(_.name)
      assert(names.exists(n => n.startsWith("sum") || n.startsWith("count")),
        s"$q: no aggregation buffers in exchange: $names")
      assert(!names.exists(corpusCols), s"$q: exchange carries corpus columns: $names")
    }
  }

  test("merge_upsert: full-outer join, never a nested-loop plan") {
    // Both snapshots are corpus-scale, so the diff must stay an equi join
    // (AQE may pick SMJ or shuffled-hash; a BNLJ full outer would buffer a
    // whole snapshot per task).
    val p = plan("merge_upsert")
    val bnlj = collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnlj.isEmpty, planString("merge_upsert"))
    val outer = collectAll(p) {
      case j: SortMergeJoinExec if j.joinType.toString == "FullOuter" => j
      case j: ShuffledHashJoinExec if j.joinType.toString == "FullOuter" => j
    }
    assert(outer.nonEmpty, planString("merge_upsert"))
  }

  test("cooccur_topk: pairs generate map-side — no join in the plan, bounded top-k") {
    // The skip-gram pairs come from higher-order functions over each doc's
    // token array; a positional self-join here would shuffle the exploded
    // token table twice at corpus scale.
    val p = plan("cooccur_topk")
    val joins = collectAll(p) {
      case j: SortMergeJoinExec => j; case j: ShuffledHashJoinExec => j
      case j: BroadcastHashJoinExec => j; case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(joins.isEmpty, planString("cooccur_topk"))
    assert(planString("cooccur_topk").contains("TakeOrderedAndProject"))
  }

  test("entity_match: candidate exchanges carry fingerprints, never name strings") {
    // The masked-fingerprint self-join must shuffle (id, hash) rows only;
    // names re-attach via the id-keyed verify joins on the deduped pair
    // set. A raw string in the candidate exchange is the n·L blowup.
    val shuffles = collectAll(plan("entity_match")) {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.toString.contains("RoundRobinPartitioning") => e
    }
    assert(shuffles.nonEmpty, planString("entity_match"))
    val fingerprint = shuffles.filter(_.outputPartitioning.toString.startsWith("hashpartitioning(k#"))
    assert(fingerprint.nonEmpty, planString("entity_match"))
    for (e <- fingerprint)
      assert(e.output.forall(a => a.name == "k" || a.name == "id"),
        s"fingerprint exchange carries more than (id, k):\n$e")
  }

  test("ohlc_bars: window and aggregation share ONE (bucket, type) exchange") {
    val shuffles = collectAll(plan("ohlc_bars")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, planString("ohlc_bars"))
  }

  test("scd2_history: both windows and the ordinal ride one user_id exchange") {
    val shuffles = collectAll(plan("scd2_history")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, planString("scd2_history"))
  }

  test("time_weighted: lookahead window and per-key aggregation share one exchange") {
    val shuffles = collectAll(plan("time_weighted")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, planString("time_weighted"))
  }

  test("contain_ngram: no exchange carries document text (hash-shingle pipeline only)") {
    val shuffles = collectAll(plan("contain_ngram")) {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.toString.contains("RoundRobinPartitioning") => e
    }
    assert(shuffles.nonEmpty, planString("contain_ngram"))
    for (e <- shuffles)
      assert(!e.output.exists(_.name == "text"),
        s"exchange carries document text:\n$e")
  }

  test("covisit_topk: basket self-join plans the distinct pipeline once; bounded top-k") {
    val df = SparkEntry.queries("covisit_topk")(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      df.queryExecution.executedPlan.toString)
    // AQE finalizes exchange reuse at materialization: both sides of the
    // pair self-join are the identical distinct-(basket, item) child, so
    // the corpus pays that distinct (and its shuffle) exactly once.
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      df.queryExecution.executedPlan.toString)
  }

  test("graph_triangles: consumes the persisted edge store, never the in-plan copresence build") {
    // The corpus-sized basket self-join lives in the store WRITE (paid
    // once per testdata generation); the query plan must read the edge
    // store's parquet and contain no lineitem scan at all.
    val df = SparkEntry.queries("graph_triangles")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("graft-copresence"), s)
    assert(!s.contains("lineitem"), s)
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("rolling_active: observed-bucket clip is an AQE-broadcast semi-join (calendar-scale build)") {
    // The clip join is un-hinted (driver-OOM safety for fine-grained
    // buckets); AQE must still pick a broadcast semi-join at calendar
    // scale — materialize so the adaptive plan is final.
    val df = SparkEntry.queries("rolling_active")(spark, sf)
    df.collect()
    // String-match: after materialization the join lives inside a
    // QueryStageExec, which plain collect() does not descend into.
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftSemi"), s)
  }

  test("attribution: one per-user exchange feeds the last-touch window") {
    // The window partitions by user_id; the final per-touch rollup is
    // channel-cardinality metadata. Exactly two non-AQE exchanges total.
    val shuffles = collectAll(plan("attribution")) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 2, planString("attribution"))
  }

  test("session_paths: session windows and the per-session fold share the user exchange") {
    // HashPartitioning(user_id) satisfies the (user_id, session_id)
    // grouping (subset key), so lag + running sum + the path fold are ONE
    // exchange; the path census is the second; the top-k bounds the rest.
    val p = plan("session_paths")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 2, p.toString)
    assert(p.toString.contains("TakeOrderedAndProject"), p.toString)
  }

  test("pagerank_k3: every round's mass gather partial-aggregates before its shuffle") {
    // Each chained push round must combine (count, sum contrib) map-side so
    // the dst-keyed exchange carries one row per (partition, node), never
    // one row per edge.
    val s = planString("pagerank_k3")
    assert(s.contains("partial_sum(contrib"), s)
    // The symmetrized edge set rides its own exchange barrier so per-round
    // consumers can reuse it instead of re-merging the distinct pipeline.
    assert(s.contains("REPARTITION_BY_COL"), s)
  }

  test("pca_power_k3: three corpus passes; chained directions are one-row broadcasts") {
    // Driver-state-free chaining: each round re-scans the corpus once and
    // receives the previous direction as a broadcast 1-row array — no
    // collect between rounds, no corpus-sized shuffle anywhere (the only
    // aggregations are dim-keyed after map-side partial sums).
    val s = planString("pca_power_k3")
    assert("FileScan parquet \\[embedding".r.findAllIn(s).size == 3, s)
    assert("IdentityBroadcastMode".r.findAllIn(s).size == 2, s)
  }
}
