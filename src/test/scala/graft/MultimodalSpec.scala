package graft

import graft.multimodal.{MediaCodec, MediaRecord, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Multimodal plumbing tests: schema/partitioning/batch-shape around the
 * (stub) codec boundary — the parts that stay when a real decoder replaces
 * the stub bodies.
 */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def bin = Seq(
    (1L, "a tiny payload"),
    (2L, "a somewhat longer payload with more bytes in it"),
    (3L, "")).toDF("id", "text")
    .select(col("id"), encode(col("text"), "UTF-8").as("data"))

  test("withImageMeta: typed schema, one row per record, no shuffle") {
    val out = Multimodal.withImageMeta(bin, "id", "data")
    assert(out.columns.toSeq === Seq("id", "n_bytes", "width", "height", "channels", "format"))
    assert(out.count() === 3)
    val shuffles = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "decode must stay a narrow transformation")
  }

  test("sampledFrames: count rows per record, deterministic hashes") {
    val out = Multimodal.sampledFrames(bin, "id", "data", count = 3)
    assert(out.count() === 9)
    val again = Multimodal.sampledFrames(bin, "id", "data", count = 3)
    assert(out.collect().toSet === again.collect().toSet)
  }

  test("resized: binary in, binary out, payload capped") {
    val ds = bin.select(col("id"), col("data")).as[MediaRecord]
    val out = Multimodal.resized(ds, maxBytes = 10).collect()
    assert(out.forall(_.data.length <= 10))
    assert(out.map(_.id).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("features are content-dependent, not just length-dependent") {
    val samePayloadLen = Seq((1L, "aaaa"), (2L, "bbbb")).toDF("id", "text")
      .select(col("id"), encode(col("text"), "UTF-8").as("data"))
    val f = Multimodal.withFeatures(samePayloadLen, "id", "data", dim = 4)
      .select(col("features")).as[Seq[Float]].collect()
    assert(f(0) !== f(1))
    assert(f.forall(v => v.size == 4 && v.forall(x => x >= 0f && x < 1f)))
  }

  test("extracted features feed the similarity operators end-to-end") {
    val feats = Multimodal.withFeatures(bin, "id", "data", dim = 8)
      .withColumnRenamed("features", "embedding")
    val top = graft.functions.Similarity.bruteForceTopK(
      feats, feats.filter(col("id") === 1L), "id", "embedding", k = 2)
    assert(top.count() === 2) // two neighbors for the one query
  }
}
