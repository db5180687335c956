package graft

import graft.functions.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // A curated target domain with a strong bigram signature, and a raw
  // pool half of which shares that signature.
  private def target = Seq(
    (1000L, "the cat sat on the mat"),
    (1001L, "the cat ran on the mat"),
    (1002L, "the dog sat on the mat")).toDF("doc_id", "text")

  private def raw = (
    (1L to 10L).map(i => (i, s"the cat sat on the mat row$i")) ++
      (11L to 20L).map(i => (i, s"zq$i xw vv kkj qqpr mzx lpo"))
    ).toDF("doc_id", "text")

  test("selectTopFraction keeps the target-like half, deterministically") {
    val kept = Dsir.selectTopFraction(target, raw, "doc_id", "text", frac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // The ten docs sharing the target's bigrams out-score the gibberish.
    assert(kept === (1L to 10L).toSet, s"kept $kept")
    // Pure function of the data: identical under repartitioning.
    val again = Dsir.selectTopFraction(
        target.repartition(7), raw.repartition(13), "doc_id", "text", frac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("weight table is bounded by the bucket count and keyed uniquely") {
    val w = Dsir.importanceWeights(target, raw, "text", buckets = 64).collect()
    assert(w.length <= 64)
    assert(w.map(_.getLong(0)).distinct.length === w.length)
    assert(w.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
    // Smoothed ratios are positive fixed-point integers.
    assert(w.forall(_.getLong(1) >= 0))
  }

  test("scores: n_bigrams is tokens-1; sub-2-token docs are unscored; exact under repartition") {
    val w = Dsir.importanceWeights(target, raw, "text")
    val pool = raw.union(Seq((99L, "solo"), (98L, "")).toDF("doc_id", "text"))
    val scored = Dsir.scoreDocs(pool, w, "doc_id", "text")
      .select("doc_id", "n_bigrams", "score")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // "solo" has one token, "" one (empty) token — neither yields a bigram.
    assert(!scored.exists(r => r._1 == 99L || r._1 == 98L))
    assert(scored.forall(r => r._2 === 6L)) // 7 tokens per fixture doc
    val again = Dsir.scoreDocs(pool.repartition(11), w, "doc_id", "text")
      .select("doc_id", "n_bigrams", "score")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === scored.toSeq)
  }

  test("weight array: never-fitted buckets carry the smoothed default, not a silent zero") {
    val w = Dsir.importanceWeightArray(target, raw, "text")
    // t=r=0 smoothing is a positive prior ratio — a zero slot would
    // invert selection pressure for novel target-like documents.
    assert(w.forall(_ > 0), "every slot must carry a positive smoothed weight")
    // A document whose bigrams were never seen by either fit pool still
    // scores (the streaming/increment case).
    val novel = Seq((500L, "wholly unfitted phrasing arrives later on")).toDF("doc_id", "text")
    val scored = Dsir.scoreDocsLit(novel, w, "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect()
    assert(scored.length === 1 && scored.head._2 > 0, scored.toSeq.toString)
  }

  test("selectStream: micro-batch threshold filter == batch scoring parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val w = Dsir.importanceWeightArray(target, raw, "text")
    // Threshold = the batch boundary between the two fixture halves.
    val batchScores = Dsir.scoreDocsLit(raw, w, "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val minScore = (1L to 10L).map(batchScores).min
    val in = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.Set[Long]()
    val q = Dsir.selectStream(in.toDF.toDF("doc_id", "text"), w, "doc_id", "text", minScore) {
      (df, _) => kept ++= df.select("doc_id").as[Long].collect()
    }.start()
    // Same pool split across two micro-batches, plus an unscorable doc.
    in.addData(raw.as[(Long, String)].collect().take(12).toSeq: _*)
    q.processAllAvailable()
    in.addData(raw.as[(Long, String)].collect().drop(12).toSeq :+ (99L -> "solo"): _*)
    q.processAllAvailable()
    q.stop()
    val want = batchScores.filter(_._2 >= minScore).keySet
    assert(kept.toSet === want, s"stream kept $kept, batch keeps $want")
    assert(!kept.contains(99L), "a bigram-less doc has no score and is dropped")
  }

  test("target-unseen buckets still score via add-one smoothing (low, not missing)") {
    // Gibberish docs probe buckets absent from the target: the smoothed
    // weight floor((0+1)/(r+1)*…) must keep them present with LOW scores,
    // not drop them from the scored pool.
    val w = Dsir.importanceWeights(target, raw, "text")
    val scored = Dsir.scoreDocs(raw, w, "doc_id", "text")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(scored.keySet === (1L to 20L).toSet)
    val likeTarget = (1L to 10L).map(scored).min
    val gibberish = (11L to 20L).map(scored).max
    assert(gibberish < likeTarget,
      s"gibberish max $gibberish should under-score target-like min $likeTarget")
  }
}
