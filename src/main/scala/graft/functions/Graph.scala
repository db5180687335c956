package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Bulk-iterative graph primitives in the PageRank family, as single-step
 * operators: each call is ONE push round (score mass flows src -> dst along
 * edges), so an N-iteration computation is N chained calls — each round a
 * self-contained, restartable Spark job, the shape that survives 100 TB
 * graphs (drivers checkpoint between rounds; nothing iterates inside a
 * task).
 *
 * Arithmetic is integer fixed-point (parts-per-million), NOT double:
 * score = 0.15 + 0.85 * Σ contrib becomes
 * `150000 + (850000 * Σ (1000000 div outdeg)) div 1000000` — every
 * operation is exact 64-bit integer math, so results are bit-identical
 * across engines, partitionings, and summation orders (a double PageRank
 * differs in the last ulps per run — unverifiable).
 *
 * 100 TB shape: outdegree is a map-side-combining count per src; the
 * contribution join is src-keyed (both sides partition on src — one
 * exchange each, AQE-splittable on skewed hubs); the gather is a dst-keyed
 * partial aggregation. No driver-side state, no collect, no iteration
 * inside the plan.
 */
object Graph {

  /** Defensive endpoint cast shared by every operator here: a null or
    * non-numeric node id would otherwise become a SQL NULL that the
    * downstream groupBy/join/filter silently drops — shrinking degrees,
    * wedge counts, and components with no diagnostic (the Affinity
    * keyAsLong posture). try_cast + raise_error names the offending
    * value; only the deliberate self-loop drop stays silent. */
  private def nodeAsLong(c: Column, what: String): Column = {
    val k = c.try_cast(LongType)
    when(k.isNotNull, k).otherwise(raise_error(
      concat(lit(s"Graph: null or non-numeric $what node id: "),
        coalesce(c.cast("string"), lit("NULL")))).cast(LongType))
  }

  /** One degree-normalized push round with uniform initial mass.
    * Output: (dst-keyed) `node`, `in_edges`, `score_ppm` where
    * score_ppm = 150000 + (850000 * Σ_{(s,node)∈E} (1000000 div outdeg(s)))
    * div 1000000 — i.e. fixed-point 0.15 + 0.85·Σ 1/outdeg(src), the first
    * PageRank iteration from a uniform unit distribution. Edges must be
    * distinct (dedupe upstream if the source multigraph means repeated
    * edges to carry multiplicity — for citation/link dedup you usually
    * want them collapsed). */
  def pushRound(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(nodeAsLong(col(srcCol), "src").as("src"),
      nodeAsLong(col(dstCol), "dst").as("dst"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    e.join(outdeg, "src")
      .withColumn("contrib", call_function("div", lit(1000000L), col("outdeg")))
      .groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_edges"), sum(col("contrib")).as("mass"))
      .select(
        col("node"),
        col("in_edges"),
        (lit(150000L) +
          call_function("div", lit(850000L) * col("mass"), lit(1000000L)))
          .as("score_ppm"))
  }

  /** The round-0 input to [[pushRoundFrom]]: every node of the edge set
    * with the uniform unit start mass (1.0 = 1,000,000 ppm). */
  def initScores(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(nodeAsLong(col(srcCol), "src").as("src"),
      nodeAsLong(col(dstCol), "dst").as("dst"))
    e.select(col("src").as("node")).unionAll(e.select(col("dst").as("node")))
      .distinct()
      .select(col("node"), lit(1000000L).as("score_ppm"))
  }

  /** One push round FROM a given score distribution — the chaining form of
    * [[pushRound]]: `scores` carries (node, score_ppm), typically the
    * previous round's output (extra columns such as `in_edges` are
    * ignored), and the round computes
    * `score'_ppm = 150000 + (850000 * Σ_{(s,node)∈E} (score_ppm(s) div
    * outdeg(s))) div 1000000` in the same exact 64-bit fixed-point
    * arithmetic. Unlike [[pushRound]], EVERY node of `scores` survives —
    * a node receiving no mass keeps the 0.15 teleport floor with
    * `in_edges = 0` — so N chained calls compute the N-iteration PageRank
    * over a stable node universe ([[initScores]] is round 0), each round
    * a self-contained restartable job: the driver persists round N's
    * (node, score_ppm) frame and feeds it to round N+1, holding no other
    * state. Per round: one map-side-combining outdegree aggregation, one
    * src-keyed join (scores and edges co-partition on src — AQE splits
    * skewed hubs), one dst-keyed partial-agg gather, one node-keyed left
    * join against the universe. Nothing corpus-sized reaches the driver. */
  def pushRoundFrom(edges: DataFrame, srcCol: String, dstCol: String,
      scores: DataFrame): DataFrame = {
    val e = edges.select(nodeAsLong(col(srcCol), "src").as("src"),
      nodeAsLong(col(dstCol), "dst").as("dst"))
    val s = scores.select(col("node").cast(LongType).as("node"),
      col("score_ppm").cast(LongType).as("score_ppm"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val gathered = e.join(outdeg, "src")
      .join(s.select(col("node").as("src"), col("score_ppm")), "src")
      .withColumn("contrib", call_function("div", col("score_ppm"), col("outdeg")))
      .groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_edges"), sum(col("contrib")).as("mass"))
    s.select(col("node"))
      .join(gathered, Seq("node"), "left")
      .select(
        col("node"),
        coalesce(col("in_edges"), lit(0L)).as("in_edges"),
        (lit(150000L) + call_function("div",
          lit(850000L) * coalesce(col("mass"), lit(0L)), lit(1000000L)))
          .as("score_ppm"))
  }

  /** Defensive enforcement of the undirected edge-set contract (distinct,
    * u < v) shared by [[triangleCounts]] and [[componentStats]]: duplicate
    * or reversed input edges would silently inflate degrees, wedge counts,
    * and n_edges. least/greatest orientation and the self-loop drop are
    * map-side; the distinct rides the exchange barrier the operators
    * already need (the aggregate reuses the repartition's hash
    * partitioning on (u, v) — no additional shuffle). Deliberate
    * tradeoff: the distinct sits ABOVE the reused exchange, so each
    * consumer subtree re-runs it — but it is partition-local CPU over
    * the (tiny, support-thresholded) edge set; the alternative
    * (.distinct().repartition(...)) dedups once below the barrier at
    * the price of a second full exchange of the same data. */
  private def normalizedEdges(edges: DataFrame, uCol: String, vCol: String): DataFrame =
    edges.select(
        least(nodeAsLong(col(uCol), "u"), nodeAsLong(col(vCol), "v")).as("u"),
        greatest(nodeAsLong(col(uCol), "u"), nodeAsLong(col(vCol), "v")).as("v"))
      .filter(col("u") < col("v"))
      .repartition(col("u"), col("v"))
      .distinct()

  /** Per-node triangle counts via the degree-ordered node-iterator
    * (Schank–Wagner orientation; the MapReduce form is Suri &
    * Vassilvitskii, WWW'11). Input: undirected edges — normalized
    * defensively to the distinct-u<v contract (reversed/duplicate/self
    * edges cannot inflate counts). Each edge is oriented from its lower-(degree, id)
    * endpoint to the higher, so every triangle is generated exactly once —
    * at the wedge whose center is the triangle's LOWEST-rank vertex — and
    * the wedge count is bounded by O(m^{3/2}) regardless of degree skew
    * (a hub of degree d contributes wedges only toward its ≤ √(2m)
    * higher-rank neighbors, never d² pairs). That bound is what makes
    * this survive a power-law graph at 100 TB; the naive u<v-id
    * orientation puts all of a low-id hub's d² wedges in one task.
    *
    * Plan shape: one degree aggregation (map-side combining), the wedge
    * self-join on `src` plans the oriented-edge pipeline ONCE
    * (ReusedExchange — both sides are the identical child), and the
    * closing check is a semi-join on (dst₁, dst₂) — candidates carry two
    * longs, never adjacency lists. Output: `(node, n_tri)`, one row per
    * vertex on ≥ 1 triangle; counts are exact.
    */
  def triangleCounts(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    // Exchange barrier on the (tiny, support-thresholded) edge set: this
    // operator consumes it from FOUR subtrees (degree agg, the main
    // degree-join path, both wedge sides, the closing check). Without
    // the barrier each consumer re-merges whatever expensive pipeline
    // produced the edges past its last exchange (for the co-purchase
    // graph: the corpus-sized pair aggregation, merged 4x); with it,
    // every consumer is a ReusedExchange of edge-set-sized data.
    val e = normalizedEdges(edges, uCol, vCol)
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    // Orient lower-(deg, id) -> higher; carry the head's (deg, id) rank so
    // the wedge join can order its two heads without re-joining degrees.
    val uFirst = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
    val headLt = col("e1.ddst") < col("e2.ddst") ||
      (col("e1.ddst") === col("e2.ddst") && col("e1.dst") < col("e2.dst"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.src") === col("e2.src") && headLt)
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
    // rank(y) < rank(z), so a closing edge is oriented y -> z by
    // construction: one semi-join against the oriented set decides it.
    val tri = wedges.join(
      oriented.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"), "left_semi")
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Connected-component roll-up: `(component, n_nodes, n_edges)` where
    * `component` is the minimum node id of the component. Labeling is
    * [[Dedup.duplicateClusters]]'s two-phase union-find contraction — ONE
    * lazy plan, no driver loop, no blocking action (see its scaladoc for
    * the 100 TB argument); this wrapper adds the node roll-up and one
    * u-keyed edge→label join for the edge counts. Input: undirected
    * edges, normalized defensively like [[triangleCounts]]. */
  def componentStats(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    // Same edge-set exchange barrier as triangleCounts (inside
    // normalizedEdges): consumed by both the union-find labeling and the
    // per-component edge count.
    val e = normalizedEdges(edges, uCol, vCol)
    val labels = Dedup.duplicateClusters(e.select(col("u").as("i"), col("v").as("j")))
    val nNodes = labels.groupBy(col("cluster_id").as("component"))
      .agg(count(lit(1)).as("n_nodes"))
    // Both edge endpoints share a component; counting by u's label is exact.
    val nEdges = e.join(labels.select(col("id").as("u"), col("cluster_id").as("component")), "u")
      .groupBy(col("component")).agg(count(lit(1)).as("n_edges"))
    nNodes.join(nEdges, "component")
  }

  /** Round-0 input to [[labelPropRound]]: every node of the (normalized)
    * edge set labeled with itself. */
  def initLabels(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = normalizedEdges(edges, uCol, vCol)
    e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .distinct()
      .select(col("node"), col("node").as("label"))
  }

  /** One SYNCHRONOUS label-propagation round (Raghavan et al. 2007, the
    * community-detection sibling of [[pushRoundFrom]]): every node adopts
    * the most frequent label among its neighbors' PREVIOUS labels, ties
    * toward the smallest label; a node with no neighbors keeps its label.
    * Deterministic by construction (synchronous update + ordered
    * tie-break), unlike the async/randomized textbook variant — which
    * also means bipartite structures can oscillate rather than converge:
    * k chained rounds are the contract, a fixpoint is not promised
    * (community detection runs a fixed small k in practice).
    *
    * 100 TB shape: one nbr-keyed equi-join of the doubled edge frame
    * against the label frame (both sides key-partitioned, AQE splits
    * hub skew), one map-side-combining (node, label) vote count, one
    * bounded argmax per node (min over the (−votes, label) struct — no
    * window), one node-keyed left join back to the universe. Labels are
    * long-cast with the same raise-on-bad-id guard as the edges. As with
    * PageRank, the driver should persist each round's output — chaining
    * k lazy rounds re-plans the edge pipeline multiplicatively. */
  def labelPropRound(
      edges: DataFrame, uCol: String, vCol: String, labels: DataFrame): DataFrame =
    labelPropRoundOn(neighborFrame(edges, uCol, vCol), labels)

  /** The doubled, deduped adjacency `(node, nbr)` [[labelPropRound]]
    * iterates over — build it ONCE, persist it, and feed
    * [[labelPropRoundOn]] per round (re-normalizing the raw edge set
    * every round is k redundant full-graph shuffles). Reversed/duplicate
    * raw edges collapse (both directions double to the same pairs), self
    * loops drop. The distinct is partitioned by the NBR side: a subset
    * hash partitioning satisfies the (node, nbr) clustering, and the
    * per-round label join keys on nbr — so the round's join reuses this
    * frame's layout instead of adding its own exchange. */
  def neighborFrame(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val g = edges.select(nodeAsLong(col(uCol), "u").as("node"),
        nodeAsLong(col(vCol), "v").as("nbr"))
      .filter(col("node") =!= col("nbr"))
    g.unionAll(g.select(col("nbr").as("node"), col("node").as("nbr")))
      .repartition(col("nbr"))
      .distinct()
  }

  /** Round-0 input to [[kcoreRound]]: the defensively normalized
    * (distinct, u < v, self-loop-free) undirected edge set. Build it
    * ONCE and persist it — each peeling round consumes the previous
    * round's SURVIVING edges, so re-normalizing per round would be k
    * redundant full-graph shuffles (the [[neighborFrame]] argument). */
  def kcoreEdges(edges: DataFrame, uCol: String, vCol: String): DataFrame =
    normalizedEdges(edges, uCol, vCol)

  /** One bulk-synchronous k-core peeling round (the parallel form of
    * Matula–Beck degeneracy peeling): drop every node whose degree in
    * the CURRENT surviving graph is < k, keep only edges with both
    * endpoints surviving. The fixpoint of repeated rounds is the k-core;
    * as with [[labelPropRoundOn]], N chained restartable rounds are the
    * contract (each round strictly shrinks the edge set, so the chain is
    * monotone — a round that removes nothing has converged), the driver
    * persists each round's edge frame and holds no other state.
    *
    * 100 TB shape: one map-side-combining degree aggregation over the
    * doubled endpoints (the shuffle carries one row per node), then two
    * UN-HINTED left-semi joins of the edge frame against the survivor
    * set — AQE broadcasts the survivors while they fit and
    * shuffle-joins on the endpoint key when they don't; hub skew splits
    * under AQE like every other node-keyed join here. No window, no
    * driver-side state, nothing corpus-sized collected. Input must
    * already satisfy the [[kcoreEdges]] contract (distinct u < v) or
    * duplicate edges inflate degrees. */
  def kcoreRound(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    val keep = degreeFrame(edges).filter(col("deg") >= k)
    edges
      .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
      .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
      .select(col("u"), col("v"))
  }

  /** Per-node degrees `(node, deg)` of an undirected (u < v, distinct)
    * edge frame — the reporting face after k chained [[kcoreRound]]s,
    * and the survivor test inside each round. One doubled-endpoint
    * map-side-combining aggregation. */
  def degreeFrame(edges: DataFrame): DataFrame =
    edges.select(col("u").as("node")).unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** One synchronous label-propagation round over a prepared
    * [[neighborFrame]] — the chaining form ([[labelPropRound]] scaladoc
    * has the semantics and the 100 TB shape). */
  def labelPropRoundOn(nbrs: DataFrame, labels: DataFrame): DataFrame = {
    val l = labels.select(nodeAsLong(col("node"), "label-frame").as("node"),
      nodeAsLong(col("label"), "label-value").as("label"))
    val votes = nbrs
      .join(l.select(col("node").as("nbr"), col("label").as("nl")), "nbr")
      .groupBy(col("node"), col("nl"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("node"))
      .agg(min(struct((-col("c")).as("nc"), col("nl").as("l"))).as("w"))
      .select(col("node"), col("w.l").as("new_label"))
    l.join(votes, Seq("node"), "left")
      .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
  }

  /** Common-neighbor link prediction: for every NON-edge pair (u < v)
    * sharing at least one (non-hub) neighbor, the number of shared
    * neighbors plus both endpoint degrees and the Jaccard neighborhood
    * overlap — the classical "people you may know" / related-item
    * candidate generator (Liben-Nowell & Kleinberg, CIKM'03 scoring
    * family; counts and degrees are its exact-arithmetic members —
    * Adamic-Adar's log is deliberately out, per the whole-bit exactness
    * contract).
    *
    * Wedge volume is Σ_w C(deg_w, 2) — inherently quadratic in hub
    * degree, and unlike triangle counting there is no orientation trick:
    * every center must emit ALL its neighbor pairs or pairs go missing.
    * The scale lever is `maxCenterDegree`: centers above it are excluded
    * from wedge generation (the stopword-pruning move — a hub shared by
    * everyone carries no signal and ALL the cost; standard practice in
    * similarity self-joins). `n_common`/`jaccard` therefore count
    * non-hub shared neighbors only, while `deg_u`/`deg_v` stay unfiltered
    * — the semantics the SQL oracle replays exactly.
    *
    * 100 TB shape: the adjacency self-join plans its doubled-edge child
    * ONCE (identical subtrees → ReusedExchange); exchanges carry long
    * pairs only; the existing-edge rejection is one un-hinted anti-join
    * on (u, v) reusing the normalized edge frame's own (u, v)
    * partitioning; per-pair fan-in is a map-side-combining count. The
    * caller applies its own top-k (TakeOrderedAndProject) — this frame
    * is the full candidate set. */
  def linkPredict(
      edges: DataFrame, uCol: String, vCol: String,
      maxCenterDegree: Int = 64): DataFrame = {
    require(maxCenterDegree >= 1,
      s"maxCenterDegree must be positive, got $maxCenterDegree")
    val e = normalizedEdges(edges, uCol, vCol)
    val adj = e.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(e.select(col("v").as("node"), col("u").as("nbr")))
    val deg = degreeFrame(e)
    val small = adj.join(
      deg.filter(col("deg") <= maxCenterDegree).select(col("node")), "node")
    val cand = small.as("a")
      .join(small.as("b"),
        col("a.node") === col("b.node") && col("a.nbr") < col("b.nbr"))
      .groupBy(col("a.nbr").as("u"), col("b.nbr").as("v"))
      .agg(count(lit(1)).as("n_common"))
      .join(e, Seq("u", "v"), "left_anti")
    cand
      .join(deg.select(col("node").as("u"), col("deg").as("deg_u")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("deg_v")), "v")
      .select(col("u"), col("v"), col("n_common"), col("deg_u"), col("deg_v"),
        (col("n_common").cast(DoubleType) /
          (col("deg_u") + col("deg_v") - col("n_common"))).as("jaccard"))
  }

  // --------------------------------------------------------------------
  // Persisted edge store — the log-structured-store face for the graph
  // family (the gram-inventory posture: the stored unit is a SET row,
  // merged by distinct-on-read). Every graph operator here consumes a
  // normalized (distinct, u < v, loop-free) edge frame, and deriving
  // that frame is typically the EXPENSIVE stage (e.g. the co-purchase
  // graph pays a corpus-sized basket self-join per build) — persist it
  // once and every downstream query (triangles, CC, LPA, k-core, link
  // prediction) starts from a metadata-scale parquet scan instead.
  //
  // Idempotence contract (the HLL max-merge / gram-inventory algebra,
  // NOT the additive count-store one): an edge row is set membership,
  // so re-appending an already-ingested slice (re-crawls, replayed
  // batches, overlapping windows) cannot change the distinct-on-read
  // union. Appends are raw (normalized within the slice only);
  // [[compactGraphEdges]] rewrites the accumulated slices as one
  // deduplicated table when read amplification warrants it.
  // --------------------------------------------------------------------

  /** Persist a normalized edge set. Input edges pass through the
    * [[kcoreEdges]] normalization (distinct, u < v, self-loop-free) so
    * every store row satisfies the contract the round operators assume
    * — duplicate or reversed raw edges collapse at write time. */
  def writeGraphEdges(
      edges: DataFrame, uCol: String, vCol: String, path: String): Unit =
    kcoreEdges(edges, uCol, vCol).write.mode("overwrite").parquet(path)

  /** Add one edge slice to the store (see class-level idempotence
    * contract — re-appending an ingested slice is a no-op on read). */
  def appendGraphEdges(
      edges: DataFrame, uCol: String, vCol: String, path: String): Unit =
    kcoreEdges(edges, uCol, vCol).write.mode("append").parquet(path)

  /** The graph ingested so far: distinct-on-read set union of the
    * slices. Each slice was normalized at write, so the union only
    * needs the cross-slice distinct; the result satisfies the
    * [[kcoreEdges]] contract and feeds every operator here directly. */
  def readGraphEdges(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).distinct()

  /** Rewrite accumulated slices as one deduplicated edge table. */
  def compactGraphEdges(
      spark: org.apache.spark.sql.SparkSession, src: String, dest: String): Unit =
    spark.read.parquet(src).distinct().write.mode("overwrite").parquet(dest)

  // --------------------------------------------------------------------
  // Versioned edge log with tombstones — the RETRACTION face the plain
  // set store lacks (edge deletes, document takedowns). Each slice
  // carries a caller-supplied GENERATION (monotone per logical slice —
  // the batch-id-ledger discipline: a replayed slice re-tags the same
  // gen, so redelivery is idempotent) and an op bit (0 = insert,
  // 1 = delete/tombstone). The winner per edge is max(struct(gen, op)):
  // the newest generation decides, and a same-gen insert+delete tie
  // resolves to DELETE deterministically. A later re-insert resurrects
  // the edge; compaction keeps the winner rows INCLUDING tombstones —
  // dropping a tombstone would let a replayed pre-delete insert slice
  // silently resurrect the edge (tombstone GC is only safe once no
  // pre-delete slice can ever be redelivered).
  // --------------------------------------------------------------------

  /** Append one insert or tombstone slice to an edge log at `path`.
    * Edges pass through the kcoreEdges normalization like the plain
    * store, so ops always address the normalized (u < v) row. */
  def appendGraphEdgeOps(
      edges: DataFrame, uCol: String, vCol: String, path: String,
      gen: Long, delete: Boolean = false): Unit =
    kcoreEdges(edges, uCol, vCol)
      .select(col("u"), col("v"), lit(gen).as("gen"),
        lit(if (delete) 1 else 0).as("op"))
      .write.mode("append").parquet(path)

  /** The live edge set under the log's last-writer-wins algebra: one
    * (u, v)-keyed aggregation (same shuffle shape as the plain store's
    * distinct-on-read), keep = newest op is an insert. Output satisfies
    * the [[kcoreEdges]] contract and feeds every operator here. */
  def readGraphEdgeLog(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("u"), col("v"))
      .agg(max(struct(col("gen"), col("op"))).as("last"))
      .filter(col("last").getField("op") === 0)
      .select(col("u"), col("v"))

  /** Rewrite the accumulated log as one winner row per edge — tombstones
    * RETAINED (see the class-level resurrection argument). Read-side
    * results are invariant across the rewrite (GraphSpec). */
  def compactGraphEdgeLog(
      spark: org.apache.spark.sql.SparkSession, src: String, dest: String): Unit =
    spark.read.parquet(src)
      .groupBy(col("u"), col("v"))
      .agg(max(struct(col("gen"), col("op"))).as("last"))
      .select(col("u"), col("v"),
        col("last").getField("gen").as("gen"), col("last").getField("op").as("op"))
      .write.mode("overwrite").parquet(dest)
}
