package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  import spark.implicits._

  test("duplicateClusters labels a chain graph scattered one edge per partition") {
    // Chain 0-1-2-...-7 with every edge in its own partition: worst case
    // for partition-local contraction — no partition sees two adjacent
    // edges, so EVERY label must be stitched through the boundary graph.
    val chain = (0L until 7L).map(i => (i, i + 1)).toDF("i", "j").repartition(7)
    val out = Dedup.duplicateClusters(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size == 8)
    assert(out.values.forall(_ == 0L), out.toString)
  }

  test("duplicateClusters: adversarial shuffled path graph — worst-case cut, second level contracts it") {
    // A 4096-node path with edges dealt randomly across 64 partitions:
    // nearly every node is a cut node, so the first boundary graph is
    // O(nodes) — the pathology where a single-level fan-in would funnel the
    // whole corpus through one task. Correctness must hold AND the second
    // contraction level must shrink what the fan-in task actually sees.
    val n = 4096
    val rnd = new scala.util.Random(7)
    val edges = rnd.shuffle((0 until n - 1).toList).map(i => (i.toLong, i + 1L))
    val df = edges.toDF("i", "j").repartition(64)

    val out = Dedup.duplicateClusters(df).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == n)
    assert(out.forall(_._2 == 0L), out.filter(_._2 != 0L).take(5).mkString(","))

    // Boundary accounting via the internal contraction step.
    val typed = df.select(col("i").cast("long"), col("j").cast("long"))
      .as[(Long, Long)]
    val (_, b1) = Dedup.contractOnce(typed)
    val (_, b2) = Dedup.contractOnce(b1)
    val c1 = b1.count(); val c2 = b2.count()
    assert(c1 <= 2L * n, s"first boundary exceeds O(n): $c1")
    assert(c2 * 2 <= c1, s"second level failed to contract the cut: b1=$c1 b2=$c2")
  }

  test("duplicateClustersIncremental: star fold equals clustering over all pairs") {
    // Random pair sets split arbitrarily into "yesterday" and "today":
    // contracting yesterday to its (id, cluster_id) assignment and
    // folding today's pairs in must label every node exactly as one
    // clustering over the union would — including chains that only
    // connect ACROSS the split (the case a naive per-slice clustering
    // silently breaks).
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val pairs = (0 until 60).map { _ =>
        val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
        (math.min(a, b), math.max(a, b) + 1)
      }
      val (y, t) = pairs.partition(_ => rnd.nextBoolean())
      if (y.nonEmpty && t.nonEmpty) {
        val yDf = y.toDF("i", "j").repartition(5)
        val tDf = t.toDF("i", "j").repartition(3)
        val all = pairs.toDF("i", "j")
        def m(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        val inc = m(Dedup.duplicateClustersIncremental(
          Dedup.duplicateClusters(yDf), tDf))
        assert(inc === m(Dedup.duplicateClusters(all)), s"trial $trial")
      }
    }
  }

  test("duplicateClustersRetract: scoped re-clustering equals clustering over survivors") {
    // The cut-vertex case first: 1-2-3 chained through 2; removing 2
    // SPLITS the component into singletons, which must LEAVE the
    // assignment (paired-docs-only contract) — a union-style fold would
    // keep 1 and 3 clustered.
    val chain = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val out = Dedup.duplicateClustersRetract(
        Dedup.duplicateClusters(chain), chain, Seq(2L).toDF("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(10L -> 10L, 11L -> 10L))
    // Property over random graphs and random takedowns: the scoped
    // path must equal one clustering over the surviving pair set,
    // covering splits, relabels (component minimum removed), and
    // untouched components in one sweep.
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val pairs = (0 until 60).map { _ =>
        val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
        (math.min(a, b), math.max(a, b) + 1)
      }
      val doomed = (0L to 40L).filter(_ => rnd.nextInt(5) == 0)
      val pDf = pairs.toDF("i", "j").repartition(5)
      val survivors = pairs
        .filter(p => !doomed.contains(p._1) && !doomed.contains(p._2))
      def m(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val scoped = m(Dedup.duplicateClustersRetract(
        Dedup.duplicateClusters(pDf), pDf, doomed.toDF("id")))
      assert(scoped === m(Dedup.duplicateClusters(survivors.toDF("i", "j"))),
        s"trial $trial doomed=$doomed")
    }
  }

  test("duplicateClusters is invariant to input partitioning") {
    // Two components whose edges straddle partition boundaries differently
    // in each layout — labels must come out identical.
    val pairs = Seq((5L, 3L), (9L, 5L), (1L, 9L), (20L, 22L), (21L, 22L))
    val expected = Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 9L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    for (p <- Seq(1, 2, 5)) {
      val out = Dedup.duplicateClusters(pairs.toDF("i", "j").repartition(p))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(out == expected, s"partitions=$p")
    }
  }

  test("duplicateClusters separates disjoint components deterministically") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("i", "j")
    val out = Dedup.duplicateClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("duplicateClusters on empty pair input returns empty") {
    val empty = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(Dedup.duplicateClusters(empty).count() == 0)
  }

  test("split-index incremental dedup equals the two-index form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e12)))
      .toSet
    val twoIndex = Dedup.minhashPairsBetween(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", threshold = 0.8)
    val split = Dedup.minhashPairsSplit(
      docs, "doc_id", "text", id => id % 2 === 1, threshold = 0.8)
    val k = key(split)
    assert(k == key(twoIndex))
    assert(k.nonEmpty)
    // never within a side: i always odd, j always even
    assert(k.forall { case (i, j, _) => i % 2 == 1 && j % 2 == 0 })
  }

  test("exactGroups: digest grouping matches text grouping, nulls group together") {
    val df = Seq((3L, "a"), (1L, "a"), (4L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String]), (5L, "b"))
      .toDF("doc_id", "text")
    val out = Dedup.exactGroups(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (keep_id = min id of group, n_dups): "a" -> (1, 2); nulls -> (2, 2);
    // "b" -> (5, 1) — identical to a direct groupBy(text).
    assert(out == Set((1L, 2L), (2L, 2L), (5L, 1L)), out.toString)
  }

  test("keepCanonical: high-dup-rate corpus works with broadcast disabled (no pinned hint)") {
    // 60% duplicates — the real-world training-corpus shape where the drop
    // list is O(corpus) and a hard broadcast(drop) would OOM the driver.
    // doc i >= 400 duplicates canonical i % 400.
    val pairs = (400L until 1000L).map(i => (i % 400, i)).toDF("i", "j")
    val docs = (0L until 1000L).toDF("doc_id")
    val expected = (0L until 400L).toSet

    // Default config: AQE/statistics pick the strategy (broadcast is fine
    // at this size).
    assert(Dedup.keepCanonical(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet == expected)

    // Broadcast forbidden: the anti-join must still run (shuffled). An
    // explicit broadcast() hint would override the threshold — this pins
    // the un-hinted shape.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Dedup.keepCanonical(docs, "doc_id", pairs)
      assert(df.collect().map(_.getLong(0)).toSet == expected)
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      import org.apache.spark.sql.catalyst.plans.LeftAnti
      val p = df.queryExecution.executedPlan
      val plans = p +: p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      val broadcastAnti = plans.flatMap(_.collect {
        case b: BroadcastHashJoinExec if b.joinType == LeftAnti => b
      })
      assert(broadcastAnti.isEmpty,
        s"drop-list anti-join broadcast despite threshold=-1 (pinned hint?):\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("incremental dedup against a persisted index equals recomputation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // "Corpus" = docs 0..399, "new day" = docs 400..499 (overlapping dups
    // exist across the boundary in the synthetic corpus).
    val corpus = docs.filter(col("doc_id") < 400)
    val newDay = docs.filter(col("doc_id") >= 400)

    val dir = java.nio.file.Files.createTempDirectory("graft-mh-index").toString
    try {
      Dedup.writeMinhashIndex(
        Dedup.buildMinhashIndex(corpus, "doc_id", "text"), dir)
      val persisted = Dedup.minhashPairsAcross(
        Dedup.buildMinhashIndex(newDay, "doc_id", "text"),
        Dedup.readMinhashIndex(spark, dir),
        threshold = 0.8)
      val recomputed = Dedup.minhashPairsBetween(
        newDay, corpus, "doc_id", "text", threshold = 0.8)
      val p = persisted.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val r = recomputed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(p.nonEmpty, "expected cross-boundary duplicates in the synthetic corpus")
      assert(p == r, s"persisted-index pairs differ: only-persisted=${p -- r} only-recomputed=${r -- p}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("mergeMinhashIndexes: union of generations, newest signature wins on re-ingest") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gen0 = docs.filter(col("doc_id") < 300)
    // Generation 1 re-ingests doc 100 with CHANGED text plus new docs.
    val reingested = docs.filter(col("doc_id") === 100)
      .withColumn("text", concat(col("text"), lit(" zz qq rr ss tt uu vv ww")))
    val gen1 = docs.filter(col("doc_id") >= 300).unionByName(reingested)
    val merged = Dedup.mergeMinhashIndexes(Seq(
      Dedup.buildMinhashIndex(gen0, "doc_id", "text"),
      Dedup.buildMinhashIndex(gen1, "doc_id", "text")))
    // Reference: one index over the union with gen1's version of doc 100.
    val ref = Dedup.buildMinhashIndex(
      docs.filter(col("doc_id") =!= 100).unionByName(reingested), "doc_id", "text")
    def sig(idx: Dedup.MinhashIndex) = idx.shingled
      .select(col("id"), col("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def bands(idx: Dedup.MinhashIndex) = idx.banded
      .select(col("id"), col("band"), col("key")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(sig(merged) === sig(ref))
    assert(bands(merged) === bands(ref))
  }

  test("containmentPairs: finds quote-in-document pairs Jaccard misses; matches brute force") {
    val short = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, short), // contained verbatim in 2 (with much more around it)
      (2L, "PREAMBLE section alpha beta gamma. " + short +
        " APPENDIX one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
      (3L, "完全 unrelated content with nothing shared at all here whatsoever indeed"),
      (4L, short), // exact dup of 1 -> mutual containment with 1, contained in 2
      (5L, "tiny") // < minShingles: must never appear as the contained side
    ).toDF("doc_id", "text")

    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleK = 4, threshold = 0.9, minShingles = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // Brute-force reference over distinct char-4-gram STRING sets.
    def sh(s: String): Set[String] =
      (1 to math.max(s.length - 3, 1)).map(i => s.slice(i - 1, i + 3)).toSet
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (for {
      (i, ti) <- texts.toSeq; (j, tj) <- texts.toSeq
      if i != j && sh(ti).size >= 8
      c = sh(ti).intersect(sh(tj)).size.toDouble / sh(ti).size
      if c >= 0.9
    } yield (i, j) -> c).toMap

    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-12, k.toString) }
    // The asymmetry that motivates the operator: 1 ⊂ 2 but NOT 2 ⊂ 1,
    // and their Jaccard is far below any dedup threshold.
    assert(got.contains((1L, 2L)) && !got.contains((2L, 1L)))
    assert(got((1L, 4L)) === 1.0 && got((4L, 1L)) === 1.0)
    assert(!got.keySet.exists(_._1 == 5L))
  }

  test("dropContained: quotes drop toward their container; mutual dups keep min id") {
    val quote = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, quote), // contained in 3 AND an exact dup of 2 -> drops
      (2L, quote), // exact dup of 1: mutual, but also contained in 3 -> drops
      (3L, "HEADER alpha beta gamma. " + quote + " FOOTER one two three four five " +
        "six seven eight nine ten eleven twelve thirteen fourteen"),
      (4L, "standalone unrelated content that shares nothing with the others at all"),
      (5L, "another standalone document entirely disjoint from every other text here"),
      (6L, "mutual twin kept: identical pair with no bigger container around it now"),
      (7L, "mutual twin kept: identical pair with no bigger container around it now")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropContained(docs, "doc_id", "text",
        shingleK = 4, threshold = 0.9, minShingles = 8)
      .collect().map(_.getLong(0)).toSet
    // 1 and 2 are strictly contained in 3 -> both drop (the container
    // survives); 6/7 are a mutual pair with no container -> min id 6 stays.
    assert(kept === Set(3L, 4L, 5L, 6L))
  }

  test("normText + exactGroups: case/whitespace variants collapse, real edits don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The Quick Brown Fox"),
      (2L, "the quick  brown fox "), // case + double space + trailing
      (3L, " THE QUICK BROWN FOX"),  // leading + shouting
      (4L, "the quick brown foxes"), // a real edit: stays distinct
      (5L, "unrelated text")
    ).toDF("doc_id", "text")
    val out = graft.functions.Dedup.exactGroups(
        docs.select(col("doc_id"), graft.functions.TextFunctions.normText(col("text")).as("text")),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 4L -> 1L, 5L -> 1L))
  }

  test("gram inventory store: increments match the batch matrix; re-appends are idempotent") {
    import spark.implicits._
    def df(rows: (String, String)*) = rows.toSeq.toDF("source", "text")
    val batch1 = df(("s1", "t1 t2 t3 t4 t5 t6 t7 t8 t9"))
    val batch2 = df(("s2", "t1 t2 t3 t4 t5 t6 t7 t8 zz"),
      ("s3", "t2 t3 t4 t5 t6 t7 t8 t9"))
    val dir = java.nio.file.Files.createTempDirectory("gram_inv").toString
    graft.functions.Dedup.writeGramInventory(batch1, "text", "source", dir)
    graft.functions.Dedup.appendGramInventory(batch2, "text", "source", dir)
    def matrix(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val stored = matrix(graft.functions.Dedup.overlapMatrixFromInventory(spark, dir))
    val direct = matrix(graft.functions.Dedup.ngramSourceOverlap(
      batch1.unionAll(batch2), "text", "source"))
    assert(stored === direct && stored.nonEmpty)
    // Overlap tolerance: replaying an already-ingested batch is a set
    // re-union — the matrix must not move (the HLL-store contract, not
    // the additive LM/BM25 one).
    graft.functions.Dedup.appendGramInventory(batch1, "text", "source", dir)
    assert(matrix(graft.functions.Dedup.overlapMatrixFromInventory(spark, dir)) === stored)
    // Compaction rewrites slices without changing the matrix.
    val dir2 = java.nio.file.Files.createTempDirectory("gram_inv2").toString
    graft.functions.Dedup.compactGramInventory(spark, dir, dir2)
    assert(matrix(graft.functions.Dedup.overlapMatrixFromInventory(spark, dir2)) === stored)
  }

  test("ngramSourceOverlap: exact shared-gram counts, distinct per source") {
    import spark.implicits._
    val docs = Seq(
      // s1: grams [t1..t8], [t2..t9]
      ("s1", "t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      // s2: shares [t1..t8] with s1; tail gram differs
      ("s2", "t1 t2 t3 t4 t5 t6 t7 t8 zz"),
      // s2 again: REPEATS the shared gram — distinct() must count it once
      ("s2", "t1 t2 t3 t4 t5 t6 t7 t8 yy"),
      // s3: exactly 8 tokens — one gram, shared with s1 only
      ("s3", "t2 t3 t4 t5 t6 t7 t8 t9"),
      // too short: contributes nothing
      ("s3", "t1 t2 t3"),
      ("s4", null.asInstanceOf[String])
    ).toDF("source", "text")
    val out = graft.functions.Dedup.ngramSourceOverlap(docs, "text", "source", n = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("s1", "s2") -> 1L, ("s1", "s3") -> 1L))
  }
}
