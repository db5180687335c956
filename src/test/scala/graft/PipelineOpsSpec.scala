package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the round-4 pipeline operators (pack_sequences,
  * tfidf_topk, dedup_keep) on the sf0.001 corpus — value-level checks the
  * DuckDB oracle can't express (invariants rather than row equality). */
class PipelineOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pack_sequences: offsets stay in [0, 512) and packs tile the token stream") {
    val rows = SparkEntry.queries("pack_sequences")(spark, dir)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, off) => off >= 0 && off < 512 })
    // Reconstruct the running total: each doc's (pack_id, pack_offset)
    // must equal the cumulative token count before it, in doc_id order.
    var before = 0L
    for ((_, nTokens, packId, off) <- rows) {
      assert(packId == before / 512 && off == before % 512)
      before += nTokens
    }
    // pack ids are nondecreasing and start at 0
    assert(rows.head._3 == 0L)
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 <= b._3; case _ => true })
  }

  test("tfidf_topk: exactly 3 ranked terms per doc, scores nonincreasing") {
    val rows = SparkEntry.queries("tfidf_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.nonEmpty)
    for ((_, terms) <- byDoc) {
      assert(terms.map(_._4).sorted.toSeq == Seq(1L, 2L, 3L))
      val byRank = terms.sortBy(_._4)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._3 > b._3 || (a._3 == b._3 && a._2 < b._2)
        case _ => true
      })
    }
  }

  test("Packing.packSequences: sparse ids across all three levels pack like a sequential fold") {
    import spark.implicits._
    // Gaps within a bucket, across buckets, and across the superbucket
    // boundary (id > 2^20) — every level of the prefix sum is exercised.
    val rows = Seq((3L, 10L), (64L, 500L), (65L, 10L), (1000L, 600L), (1048580L, 5L))
    val out = graft.functions.Packing
      .packSequences(rows.toDF("id", "n"), "id", "n", packLen = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    var before = 0L
    val expected = rows.sortBy(_._1).map { case (id, n) =>
      val e = (id, n, before / 512, before % 512); before += n; e
    }
    assert(out.toSeq == expected)
  }

  test("chunk_docs: 256-char windows every 192 chars tile every document") {
    val rows = SparkEntry.queries("chunk_docs")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == lens.keySet)
    for ((id, chunks) <- byDoc) {
      val L = lens(id)
      val n = (math.max(0, L - 256) + 191) / 192 + 1
      assert(chunks.length == n, s"doc $id: ${chunks.length} chunks, want $n")
      assert(chunks.map(_._2).sorted.toSeq == (0 until n))
      for ((_, idx, chars) <- chunks)
        assert(chars == math.min(256, math.max(0, L - idx * 192)), s"doc $id chunk $idx")
      // the final window reaches the end of the document
      assert(192 * (n - 1) + chunks.maxBy(_._2)._3 >= L)
    }
  }

  test("pipeline stages are observable in ONE action (no per-stage counts pass)") {
    // The batch twin of the streaming drift counters: Dataset.observe
    // metrics ride the single job that evaluates the final plan, so a
    // pipeline reports per-stage survivor counts with zero extra corpus
    // passes — where a naive `df.count()` per stage would re-run every
    // upstream stage per probe.
    import org.apache.spark.sql.Observation
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val oIn = Observation("graft_in")
    val oGated = Observation("graft_gated")
    val gated = docs
      .observe(oIn, count(lit(1)).as("rows"))
      .filter(col("text").isNotNull && length(col("text")) >= 200)
      .observe(oGated, count(lit(1)).as("rows"))
    val out = gated.filter(col("lang") === "en").count()
    val nIn = oIn.get("rows").asInstanceOf[Long]
    val nGated = oGated.get("rows").asInstanceOf[Long]
    assert(nIn === docs.count())
    assert(nGated === docs.filter(col("text").isNotNull && length(col("text")) >= 200).count())
    assert(nIn > nGated && nGated > out, "fixture must discriminate the stages")
  }

  test("dedup_keep: keeps exactly the canonical member of every cluster") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val clusters = SparkEntry.queries("dedup_clusters")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val kept = SparkEntry.queries("dedup_keep")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val nonCanonical = clusters.collect { case (id, c) if id != c => id }.toSet
    val all = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(nonCanonical.nonEmpty)
    assert(kept == all -- nonCanonical)
  }

  test("winnowFingerprint: matches a scalar replica; shared-substring guarantee holds") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    // Scalar replica of the whole selector: positional 4-gram md5 hashes,
    // min per 4-window, distinct — independently recomputed, so an
    // off-by-one in either the gram or the window sequence can't cancel.
    def h32(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    def replica(text: String, k: Int, w: Int): Seq[Long] = {
      val grams = (1 to math.max(text.length - (k - 1), 1))
        .map(i => text.substring(i - 1, math.min(i - 1 + k, text.length)))
      val hs = grams.map(h32)
      (1 to math.max(hs.size - (w - 1), 1))
        .map(j => hs.slice(j - 1, j - 1 + w).min).distinct
    }
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a COMPLETELY different document SHARING brown fox jumps words",
      "tiny", "ab", // shorter than k: the guarded sequence must not blow up
      "aaaaaaaaaaaa" // degenerate: all grams identical -> 1 fingerprint
    )
    val out = docs.toDF("text")
      .select(TF.positionalShingleHashes(col("text"), 4).as("hs"))
      .select(TF.winnowMinima(col("hs"), w = 4).as("fp"))
      .collect().map(_.getSeq[Long](0).toSeq)
    for ((d, got) <- docs.zip(out))
      assert(got.sorted === replica(d, 4, 4).sorted, s"doc: '$d'")
    // Winnowing guarantee: a shared substring of length >= w + k - 1 = 7
    // ("brown fox jumps") forces >= 1 shared fingerprint hash.
    assert(out(0).toSet.intersect(out(1).toSet).nonEmpty)
  }

  test("markov_trans: counts match a scalar fold; rows normalize to 1 per prev state") {
    import spark.implicits._
    val events = Seq(
      // user 1: a -> b -> b -> c ; user 2: a -> c ; user 3: b (no pair)
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 20L, 3L, "b"), (1L, 30L, 4L, "c"),
      (2L, 5L, 5L, "a"), (2L, 6L, 6L, "c"),
      (3L, 1L, 7L, "b"))
    val out = graft.functions.Markov.transitionMatrix(
        events.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "event_type", orderCols = Seq("ts", "event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out === Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "b") -> ((1L, 0.5)), ("b", "c") -> ((1L, 0.5))))
  }

  test("skipgramPairs: window-2 pairs match the positional definition; short docs are safe") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TF}
    val out = Seq("a b c d", "x", "", "p q").toDF("text")
      .select(explode(TF.skipgramPairs(TF.wsTokens(col("text")), window = 2)).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // "a b c d" -> (a,b)(a,c)(b,c)(b,d)(c,d); "x" -> none; "" splits to
    // [""] (single token) -> none; "p q" -> (p,q).
    assert(out.sorted.toSeq === Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"), ("p", "q")).sorted)
  }
}
