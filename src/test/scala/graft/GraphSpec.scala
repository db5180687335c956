package graft

import graft.functions.{Affinity, Graph}
import org.apache.spark.sql.functions._

import scala.util.Random

class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("triangleCounts: K4 plus a disjoint triangle plus a pendant edge") {
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, each node on 3.
    // Triangle {10,11,12}: each node on 1. Edge {20,21}: no triangles.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)
    ).toDF("u", "v")
    val out = Graph.triangleCounts(edges, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 1L, 11L -> 1L, 12L -> 1L))
  }

  test("triangleCounts: seeded random graph matches the brute-force census") {
    val rnd = new Random(42)
    val n = 40
    val edgeSet = (for {
      u <- 0 until n; v <- (u + 1) until n if rnd.nextDouble() < 0.15
    } yield (u.toLong, v.toLong)).toSet
    val adj = edgeSet ++ edgeSet.map { case (a, b) => (b, a) }
    val expected = (for {
      (a, b) <- edgeSet; c <- 0L until n.toLong
      if c > b && adj((a, c)) && adj((b, c))
    } yield Seq(a, b, c)).toSeq.flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val out = Graph.triangleCounts(edgeSet.toSeq.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === expected)
  }

  test("triangleCounts: count is partitioning-invariant") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (1L, 4L))
    val one = Graph.triangleCounts(edges.toDF("u", "v").repartition(1), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val many = Graph.triangleCounts(edges.toDF("u", "v").repartition(7), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(one === many)
  }

  test("edge normalization: reversed, duplicate, and self edges cannot inflate counts") {
    val clean = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), // triangle
      (10L, 11L)).toDF("u", "v")
    val messy = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // reversed + duplicate
      (3L, 1L), (2L, 3L), (2L, 3L),
      (10L, 11L), (11L, 10L),
      (5L, 5L) // self loop: dropped, contributes nothing
    ).toDF("u", "v")
    def tri(df: org.apache.spark.sql.DataFrame) = Graph.triangleCounts(df, "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri(messy) === tri(clean))
    def cc(df: org.apache.spark.sql.DataFrame) = Graph.componentStats(df, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cc(messy) === cc(clean))
    assert(cc(clean) === Set((1L, 3L, 3L), (10L, 2L, 1L)))
  }

  test("Graph: null or non-numeric node ids raise instead of silently vanishing") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // A string endpoint would cast to NULL and the edge would vanish from
    // degrees/wedges/components with no diagnostic (the Affinity posture).
    val strEdges = Seq(("1", "2"), ("node-x", "3")).toDF("u", "v")
    val e1 = intercept[Exception](Graph.triangleCounts(strEdges, "u", "v").collect())
    assert(messages(e1).exists(m => m.contains("node id") && m.contains("node-x")), e1.toString)
    // A null endpoint likewise raises (filter(u < v) would silently drop it).
    val nullEdges = Seq((Option(1L), Option(2L)), (None, Option(3L))).toDF("u", "v")
    val e2 = intercept[Exception](Graph.componentStats(nullEdges, "u", "v").collect())
    assert(messages(e2).exists(_.contains("node id")), e2.toString)
    val e3 = intercept[Exception](Graph.pushRound(strEdges, "u", "v").collect())
    assert(messages(e3).exists(_.contains("node id")), e3.toString)
  }

  test("labelPropRound: matches a scalar reference over seeded random graphs") {
    // Synchronous LPA reference: every node takes the most frequent label
    // among its neighbors' previous labels, ties to the smallest label.
    def reference(edges: Seq[(Long, Long)], labels: Map[Long, Long]): Map[Long, Long] = {
      val adj = (edges ++ edges.map(_.swap)).filter(p => p._1 != p._2)
        .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      labels.map { case (n, old) =>
        adj.get(n) match {
          case None => n -> old
          case Some(nbrs) =>
            val counts = nbrs.map(labels).groupBy(identity).view.mapValues(_.size)
            n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 24
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val eDf = edges.toDF("u", "v").repartition(5)
      var labels = Graph.initLabels(eDf, "u", "v")
      var ref = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (round <- 1 to 3) {
        labels = Graph.labelPropRound(eDf, "u", "v", labels)
        ref = reference(edges, ref)
        val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === ref, s"trial $trial round $round")
      }
    }
  }

  test("labelPropRound: isolated node in the label frame keeps its label") {
    val eDf = Seq((1L, 2L)).toDF("u", "v")
    val labels = Seq((1L, 1L), (2L, 2L), (99L, 7L)).toDF("node", "label")
    val got = Graph.labelPropRound(eDf, "u", "v", labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 99L -> 7L))
  }

  test("Affinity: non-numeric item ids raise instead of silently vanishing") {
    val df = Seq((1L, "SKU-9"), (1L, "SKU-7"), (2L, "SKU-9")).toDF("basket", "item")
    val e = intercept[Exception] {
      Affinity.copresencePairs(df, "basket", "item").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-numeric item id")), e.toString)
  }

  test("componentStats: sizes and edge counts per component, min-id labels") {
    // Path 1-2-3-4 (3 edges), triangle 10-11-12 (3 edges), pair 20-21.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)
    ).toDF("u", "v")
    val out = Graph.componentStats(edges, "u", "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(1L -> ((4L, 3L)), 10L -> ((3L, 3L)), 20L -> ((2L, 1L))))
  }

  test("componentStats: seeded random graphs match a scalar union-find") {
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new Random(seed)
      val n = 60
      // Sparse: ~n*0.8 edges -> many small components + the odd chain.
      val edges = (for (_ <- 0 until (n * 4 / 5)) yield {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        if (a < b) (a.toLong, b.toLong) else (b.toLong, a.toLong)
      }).filter(e => e._1 != e._2).distinct
      // Scalar union-find reference.
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      for ((a, b) <- edges) parent(find(a.toInt)) = find(b.toInt)
      val touched = edges.flatMap(e => Seq(e._1.toInt, e._2.toInt)).distinct
      val byRoot = touched.groupBy(find)
      val expected = byRoot.map { case (_, ns) =>
        val comp = ns.map(_.toLong).min
        comp -> ((ns.size.toLong,
          edges.count { case (a, b) => find(a.toInt) == find(ns.head) }.toLong))
      }
      val out = Graph.componentStats(edges.toDF("u", "v"), "u", "v")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(out === expected, s"seed=$seed")
    }
  }

  test("kcoreRound: peels pendants, keeps the core, converges to fixpoint") {
    // K4 on {1,2,3,4} (the 3-core), a tail 4-5-6, and a triangle {10,11,12}
    // hanging off node 4 via edge (4,10).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
      (10L, 11L), (10L, 12L), (11L, 12L), (4L, 10L)
    ).toDF("u", "v")
    val e0 = Graph.kcoreEdges(edges, "u", "v")
    // Round 1 at k=3 drops {5,6,11,12} (deg < 3) but KEEPS 10 (deg 3 via
    // the bridge); round 2 sees 10's degree collapse to 1 and drops it —
    // the two-round cascade only peeling can see.
    val e1 = Graph.kcoreRound(e0, 3)
    val e2 = Graph.kcoreRound(e1, 3)
    val e3 = Graph.kcoreRound(e2, 3)
    val core = e3.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // Fixpoint: another round removes nothing.
    val e4 = Graph.kcoreRound(e3, 3)
    assert(e4.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === core)
    // Degrees of the surviving K4 are all 3.
    val deg = Graph.degreeFrame(e3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kcoreRound: k=2 strips a tree entirely, leaf-layer by leaf-layer") {
    // A path 1-2-3-4-5 has no 2-core; each round peels the current leaves.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    var e = Graph.kcoreEdges(path, "u", "v")
    val sizes = (1 to 3).map { _ => e = Graph.kcoreRound(e, 2); e.count() }
    assert(sizes === Seq(2L, 0L, 0L))
  }

  test("copresencePairs: exact counts and Jaccard over shared baskets") {
    // item 1 in baskets {1,2,3}; item 2 in {1,2}; item 3 in {3}.
    // (1,2): both in 2 baskets, union 3 -> J = 2/3.
    // (1,3): both in 1, union 3 -> J = 1/3. (2,3): no shared basket.
    val bi = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L),
      (1L, 1L) // duplicate line: distinct() must collapse it
    ).toDF("basket", "item")
    val out = Affinity.copresencePairs(bi, "basket", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out === Map(
      (1L, 2L) -> ((2L, 2.0 / 3.0)),
      (1L, 3L) -> ((1L, 1.0 / 3.0))))
  }

  test("copresenceGraph: support threshold keeps only repeated pairs") {
    val bi = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), // pair (1,2) support 2
      (3L, 1L), (3L, 3L) // pair (1,3) support 1
    ).toDF("basket", "item")
    val out = Affinity.copresenceGraph(bi, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L)))
  }

  test("linkPredict: exact common-neighbor census on a crafted graph") {
    // Square 1-2-4-3-1 with diagonal 2-3, pendant 5-1:
    //   N(1)={2,3,5} N(2)={1,3,4} N(3)={1,2,4} N(4)={2,3} N(5)={1}
    // Non-edges with shared neighbors: (1,4) via {2,3}; (2,5),(3,5) via {1};
    // (4,5) shares nothing. Reversed/duplicate input rows must collapse.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 1L),
      (2L, 1L), (1L, 2L) // reversed + duplicate
    ).toDF("u", "v")
    val out = Graph.linkPredict(edges, "u", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out === Map(
      (1L, 4L) -> ((2L, 3L, 2L, 2.0 / 3.0)),
      (2L, 5L) -> ((1L, 3L, 1L, 1.0 / 3.0)),
      (3L, 5L) -> ((1L, 3L, 1L, 1.0 / 3.0))))
    // Hub cap: every shared neighbor above has degree 3, so capping
    // centers at 2 removes all wedges — the stopword-pruning semantics
    // (candidates vanish rather than count hub-mediated overlap).
    assert(Graph.linkPredict(edges, "u", "v", maxCenterDegree = 2).isEmpty)
  }

  test("linkPredict hub cap: measured recall curve on a seeded preferential graph") {
    // The calibration study behind the maxCenterDegree knob (DESIGN.md
    // "linkPredict hub-cap recall"): on a seeded preferential-attachment
    // graph (hubs emerge naturally; degmax 36, deg90 11 at this seed),
    // recall@50 of the capped top-candidate set vs the UNCAPPED census is
    // monotone in the cap, crosses ~0.85 when the cap clears ~3x the
    // 90th-percentile degree, and is exactly 1.0 once the cap clears the
    // max degree (capping is then a no-op by construction).
    val rnd = new Random(1234)
    val n = 300
    val edgeSet = scala.collection.mutable.Set.empty[(Long, Long)]
    val ends = scala.collection.mutable.ArrayBuffer[Long](0L, 1L)
    edgeSet += ((0L, 1L))
    for (v <- 2 until n) {
      val targets = scala.collection.mutable.Set.empty[Long]
      while (targets.size < math.min(3, v)) {
        val t = if (rnd.nextBoolean()) ends(rnd.nextInt(ends.size))
                else rnd.nextInt(v).toLong
        if (t != v) targets += t
      }
      for (t <- targets) {
        val (a, b) = (math.min(v.toLong, t), math.max(v.toLong, t))
        if (edgeSet.add((a, b))) { ends += a; ends += b }
      }
    }
    val df = edgeSet.toSeq.toDF("u", "v")
    val degMax = edgeSet.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size).max
    def topk(cap: Int) =
      Graph.linkPredict(df, "u", "v", maxCenterDegree = cap)
        .orderBy(col("n_common").desc, col("u"), col("v")).limit(50)
        .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topk(Int.MaxValue)
    val recalls = Seq(8, 32, 64).map(c =>
      c -> topk(c).intersect(exact).size.toDouble / exact.size)
    // Monotone in the cap (larger cap can only add wedges).
    assert(recalls.sliding(2).forall { case Seq((_, a), (_, b)) => a <= b },
      recalls.toString)
    // Floors measured 2026-08-15 (0.24 / 0.86 / 1.0); asserted with slack.
    assert(recalls.toMap.apply(32) >= 0.8, recalls.toString)
    assert(degMax <= 64 && recalls.toMap.apply(64) == 1.0,
      s"cap past degmax ($degMax) must be a no-op: $recalls")
  }

  test("basket-items store: split baskets across slices, replay idempotence, batch parity") {
    val dir = java.nio.file.Files.createTempDirectory("basket_items").toString + "/bi"
    // Basket 10 is SPLIT across the two slices (items 1,2 then 2,3): an
    // edge-level store would miss the cross-slice pair (1,3); membership
    // rows union to the full basket. Basket 20 repeats (1,2) for support.
    val slice1 = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L)).toDF("b", "it")
    val slice2 = Seq((10L, 2L), (10L, 3L), (30L, 1L), (30L, 3L)).toDF("b", "it")
    Affinity.writeBasketItems(slice1, "b", "it", dir)
    Affinity.appendBasketItems(slice2, "b", "it", dir)
    def graph() = Affinity.copresenceGraphFromStore(spark, dir, minSupport = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = graph()
    val batch = Affinity.copresenceGraph(
        slice1.unionAll(slice2), "b", "it", minSupport = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored === batch)
    // The cross-slice pair exists only because membership, not edges, is
    // what the store holds.
    assert(stored.contains((1L, 3L)), stored.mkString(", "))
    // Replay: set algebra, nothing moves — including SUPPORT counts.
    // Baskets: 10={1,2,3} (via the slice union), 20={1,2}, 30={1,3}, so
    // at support 2 exactly {(1,2),(1,3)} qualify; (2,3) has support 1
    // and a replayed slice must NOT double-count it across the line.
    Affinity.appendBasketItems(slice1, "b", "it", dir)
    assert(graph() === stored)
    val sup2 = Affinity.copresenceGraphFromStore(spark, dir, minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sup2 === Set((1L, 2L), (1L, 3L)),
      s"support must stay distinct-basket-exact: $sup2")
  }

  test("store composition: basket ingest -> copresence graph -> edge store -> triangles") {
    // The full derived-artifact chain a production deployment runs: raw
    // (basket, item) slices land in the membership store; the copresence
    // graph derives from it; the edge store materializes that graph for
    // the query family; triangle counts off the edge store equal the
    // one-shot batch operator over the raw rows.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("b"), col("l_partkey").as("it"))
    val biDir = java.nio.file.Files.createTempDirectory("compose_bi").toString + "/bi"
    val edDir = java.nio.file.Files.createTempDirectory("compose_ed").toString + "/e"
    Affinity.writeBasketItems(li.filter(col("b") % 2 === 0), "b", "it", biDir)
    Affinity.appendBasketItems(li.filter(col("b") % 2 === 1), "b", "it", biDir)
    Graph.writeGraphEdges(
      Affinity.copresenceGraphFromStore(spark, biDir, minSupport = 2L),
      "u", "v", edDir)
    def tri(edges: org.apache.spark.sql.DataFrame) =
      Graph.triangleCounts(edges, "u", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStores = tri(Graph.readGraphEdges(spark, edDir))
    val direct = tri(Affinity.copresenceGraph(li, "b", "it", minSupport = 2L))
    assert(viaStores === direct)
    assert(direct.nonEmpty, "fixture must contain triangles")
  }

  test("edge store: slice parity, normalization at write, re-append idempotence") {
    val dir = java.nio.file.Files.createTempDirectory("graph_edges").toString + "/edges"
    // Slice 1 arrives messy (reversed, duplicate, self-loop rows) — the
    // store must normalize at write so every stored row satisfies the
    // kcoreEdges contract. Slice 2 overlaps slice 1 on (2,3).
    val slice1 = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 2L), (4L, 4L))
      .toDF("u", "v")
    val slice2 = Seq((2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    Graph.writeGraphEdges(slice1, "u", "v", dir)
    Graph.appendGraphEdges(slice2, "u", "v", dir)
    def edgeSet() = Graph.readGraphEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = edgeSet()
    assert(stored === Set((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    // Slice boundaries are invisible downstream: operators over the store
    // match the same operators over the normalized union.
    val viaStore = Graph.degreeFrame(Graph.readGraphEdges(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStore === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    // Replayed slice: set algebra, distinct-on-read — nothing moves.
    Graph.appendGraphEdges(slice1, "u", "v", dir)
    assert(edgeSet() === stored)
    // Compaction rewrites slices without changing the set.
    val dest = dir + "_compact"
    Graph.compactGraphEdges(spark, dir, dest)
    assert(Graph.readGraphEdges(spark, dest)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === stored)
  }

  test("edge store compaction: operator results invariant across the rewrite") {
    // The lifecycle guarantee a long-lived store needs: after months of
    // appends (with replays), compacting must be invisible to every
    // consumer — same triangles, same degrees, same core.
    val dir = java.nio.file.Files.createTempDirectory("graph_compact").toString + "/edges"
    // A triangle + pendant, ingested as three overlapping slices with a
    // full replay of slice 2.
    Graph.writeGraphEdges(Seq((1L, 2L), (2L, 3L)).toDF("u", "v"), "u", "v", dir)
    Graph.appendGraphEdges(Seq((3L, 1L), (1L, 2L)).toDF("u", "v"), "u", "v", dir)
    Graph.appendGraphEdges(Seq((3L, 4L)).toDF("u", "v"), "u", "v", dir)
    Graph.appendGraphEdges(Seq((3L, 1L), (1L, 2L)).toDF("u", "v"), "u", "v", dir) // replay
    val dest = dir + "_compact"
    Graph.compactGraphEdges(spark, dir, dest)
    def tri(p: String) = Graph.triangleCounts(Graph.readGraphEdges(spark, p), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def deg(p: String) = Graph.degreeFrame(Graph.readGraphEdges(spark, p))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri(dest) === tri(dir))
    assert(deg(dest) === deg(dir))
    // The compacted table is physically deduplicated, not just logically:
    // a raw scan (no distinct) equals the set.
    val raw = spark.read.parquet(dest)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(raw.length === raw.toSet.size)
    assert(raw.toSet === Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
  }

  test("edge log: tombstones delete, replays are idempotent, re-inserts resurrect, compaction keeps tombstones") {
    val dir = java.nio.file.Files.createTempDirectory("graph_log").toString + "/log"
    def live(p: String) = Graph.readGraphEdgeLog(spark, p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Graph.appendGraphEdgeOps(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v"), "u", "v", dir, gen = 0L)
    assert(live(dir) === Set((1L, 2L), (2L, 3L), (3L, 4L)))
    // Takedown: tombstone one edge; a replayed tombstone slice re-tags
    // identical rows — nothing moves.
    Graph.appendGraphEdgeOps(
      Seq((2L, 3L)).toDF("u", "v"), "u", "v", dir, gen = 1L, delete = true)
    Graph.appendGraphEdgeOps(
      Seq((2L, 3L)).toDF("u", "v"), "u", "v", dir, gen = 1L, delete = true)
    assert(live(dir) === Set((1L, 2L), (3L, 4L)))
    // Same-generation insert + delete tie resolves to DELETE.
    Graph.appendGraphEdgeOps(
      Seq((3L, 4L)).toDF("u", "v"), "u", "v", dir, gen = 2L, delete = true)
    Graph.appendGraphEdgeOps(
      Seq((3L, 4L)).toDF("u", "v"), "u", "v", dir, gen = 2L)
    assert(live(dir) === Set((1L, 2L)))
    // A LATER re-insert resurrects.
    Graph.appendGraphEdgeOps(
      Seq((2L, 3L)).toDF("u", "v"), "u", "v", dir, gen = 3L)
    assert(live(dir) === Set((1L, 2L), (2L, 3L)))
    // Compaction: read-invariant, one winner row per edge, tombstones
    // RETAINED — a replayed pre-delete insert slice must NOT resurrect.
    val dest = dir + "_compact"
    Graph.compactGraphEdgeLog(spark, dir, dest)
    assert(live(dest) === live(dir))
    val raw = spark.read.parquet(dest).collect()
    assert(raw.length === 3, raw.mkString(", ")) // (1,2) in, (2,3) in, (3,4) tombstone
    Graph.appendGraphEdgeOps(
      Seq((3L, 4L)).toDF("u", "v"), "u", "v", dest, gen = 0L) // replayed old insert
    assert(live(dest) === Set((1L, 2L), (2L, 3L)),
      "a retained tombstone must beat a replayed pre-delete insert")
  }

  test("oncePerDir: unchanged source caches; a regenerated source resolves to a fresh store") {
    // The stale-fingerprint hazard (round-10 advice): the fingerprint is
    // re-taken on EVERY resolution, so a testdata directory regenerated
    // mid-JVM must resolve to a NEW store path and rebuild — while an
    // unchanged source must hit the cache and never rebuild.
    val src = java.nio.file.Files.createTempDirectory("graft_srcdir").toString
    Seq((1L, 2L)).toDF("u", "v").write.parquet(s"$src/lineitem.parquet")
    val kind = s"specstore${System.nanoTime()}"
    var builds = 0
    def resolve(): String = SparkEntry.oncePerDir(src, kind, "lineitem") { p =>
      builds += 1
      val d = new java.io.File(p); d.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p, "marker"), s"build$builds")
    }
    val p1 = resolve()
    val p2 = resolve()
    assert(p1 === p2 && builds === 1, "unchanged source must cache")
    // Regenerate the source table (new part files -> new fingerprint).
    Seq((1L, 2L), (3L, 4L)).toDF("u", "v")
      .write.mode("overwrite").parquet(s"$src/lineitem.parquet")
    val p3 = resolve()
    assert(p3 !== p1, "regenerated source must resolve to a fresh store")
    assert(builds === 2, "regenerated source must rebuild")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(p3, "marker")) === "build2")
  }
}
