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

  // ---- real-decode path (javax.imageio; fixtures generated in-test) ----

  /** Encode a w×h gradient image as `fmt` ("png"/"jpg"/"bmp"/"gif"). */
  private def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("decodeImageMeta reads real PNG/JPEG/BMP pixels, not the fallback") {
    for ((fmt, expected) <- Seq("png" -> "png", "jpg" -> "jpeg", "bmp" -> "bmp")) {
      val m = MediaCodec.decodeImageMeta(imageBytes(37, 21, fmt))
      assert(m.width == 37 && m.height == 21, s"$fmt: $m")
      assert(m.channels == 3, s"$fmt: $m")
      assert(m.format == expected, s"$fmt: $m")
    }
  }

  test("decodeImageMeta falls back deterministically on non-image payloads") {
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(MediaCodec.decodeImageMeta(junk) == MediaCodec.fallbackMeta(junk))
    // Corrupt header: starts like PNG but truncated mid-stream.
    val corrupt = imageBytes(16, 16, "png").take(20)
    assert(MediaCodec.decodeImageMeta(corrupt) == MediaCodec.fallbackMeta(corrupt))
  }

  test("resizeImage scales to fit preserving aspect ratio and re-encodes decodably") {
    val out = MediaCodec.resizeImage(imageBytes(100, 50, "png"), 40, 40).get
    val m = MediaCodec.decodeImageMeta(out)
    assert(m.width == 40 && m.height == 20, m.toString) // aspect 2:1 kept
    assert(m.format == "png")
    // No upscaling: an image already inside the box keeps its dims.
    val same = MediaCodec.resizeImage(imageBytes(10, 8, "png"), 40, 40).get
    val ms = MediaCodec.decodeImageMeta(same)
    assert(ms.width == 10 && ms.height == 8)
  }

  test("byte-budget resize shrinks real images under the cap, truncates junk") {
    val big = imageBytes(300, 300, "png")
    val cap = big.length / 2
    val shrunk = MediaCodec.resize(big, cap)
    assert(shrunk.length <= cap, s"${shrunk.length} > $cap")
    assert(MediaCodec.decodeImage(shrunk).isDefined, "output must stay a valid image")
    val junk = Array.fill[Byte](100)(7)
    assert(MediaCodec.resize(junk, 10).toSeq == junk.take(10).toSeq)
  }

  /** Encode `n` PCM16 mono frames of a 440 Hz tone at `rate` Hz as WAV. */
  private def wavBytes(rate: Int, n: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudioMeta reads real WAV headers, falls back on opaque bytes") {
    val (rate, ch, frames, fmt) = MediaCodec.decodeAudioMeta(wavBytes(16000, 800))
    assert(rate == 16000 && ch == 1 && frames == 800L, s"$rate $ch $frames")
    assert(fmt.contains("pcm"), fmt)
    val junk = "not audio".getBytes("UTF-8")
    val (fr, fc, ff, _) = MediaCodec.decodeAudioMeta(junk)
    assert(fr == 8000 + junk.length % 40000 && fc == 1 + junk.length % 2 && ff == junk.length.toLong)
  }

  test("withAudioMeta over a mixed corpus decodes WAV rows and falls back elsewhere") {
    val mixed = Seq(
      (1L, wavBytes(22050, 441)),
      (2L, "opaque".getBytes("UTF-8"))).toDF("id", "data")
    val out = Multimodal.withAudioMeta(mixed, "id", "data")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 22050 && out(1L).getLong(3) == 441L)
    assert(out(2L).getInt(1) == 8000 + "opaque".length % 40000)
  }

  test("pixel-true image features: identical images at cosine 1, inverted images lower") {
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val img = imageBytes(64, 64, "png")
    // Same pixels, different encoding → identical features (a content
    // embedding, unlike the byte-hash stub).
    val png = MediaCodec.extractImageFeatures(img, 64)
    val bmp = MediaCodec.extractImageFeatures(imageBytes(64, 64, "bmp"), 64)
    assert(cosine(png, bmp) > 0.9999, cosine(png, bmp).toString)
    // A vertically flipped gradient is a different image: similar but
    // clearly farther than the re-encoded identical one.
    val flipped = {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))
      val out = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) out.setRGB(x, 63 - y, src.getRGB(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
    val flf = MediaCodec.extractImageFeatures(flipped, 64)
    assert(cosine(png, flf) < cosine(png, bmp))
    // Undecodable payloads fall back to the content-hash stub.
    val junk = "junk".getBytes("UTF-8")
    assert(MediaCodec.extractImageFeatures(junk, 64).toSeq ==
      MediaCodec.extractFeatures(junk, 64).toSeq)
  }

  test("withImageMeta over a mixed corpus: real rows decode, opaque rows fall back") {
    val mixed = Seq(
      (1L, imageBytes(40, 30, "png")),
      (2L, imageBytes(25, 25, "jpg")),
      (3L, "opaque payload".getBytes("UTF-8"))).toDF("id", "data")
    val out = Multimodal.withImageMeta(mixed, "id", "data")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) == 40 && out(1L).getInt(3) == 30)
    assert(out(2L).getString(5) == "jpeg")
    val fb = MediaCodec.fallbackMeta("opaque payload".getBytes("UTF-8"))
    assert(out(3L).getInt(2) == fb.width && out(3L).getInt(3) == fb.height)
  }

  /** A w×h gradient image with an optional small blemish painted in. */
  private def blemished(w: Int, h: Int, blemish: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
    if (blemish) for (x <- 0 until 3; y <- 0 until 3) img.setRGB(x, y, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash16: near-identical images land within the Hamming budget, fallback is md5-exact") {
    val a = MediaCodec.dHash16(blemished(100, 80, blemish = false))
    val b = MediaCodec.dHash16(blemished(100, 80, blemish = true))
    assert(java.lang.Long.bitCount((a ^ b).toInt & 0xffff) <= 3,
      s"blemish flipped too many bits: $a vs $b")
    // Opaque payloads: the hash is the adjacent-comparison fold of the
    // md5-derived fallback features — the exact arithmetic the oracle runs.
    val junk = "definitely not an image".getBytes("UTF-8")
    val f = MediaCodec.extractFeatures(junk, 17)
    val expected = (0 until 16).map(i => if (f(i + 1) > f(i)) 1L << i else 0L).sum
    assert(MediaCodec.dHash16(junk) === expected)
  }

  test("phashPairs finds the perceptual near-pair and skips unrelated images") {
    val rows = Seq(
      (1L, blemished(100, 80, blemish = false)),
      (2L, blemished(100, 80, blemish = true)),
      (3L, imageBytes(80, 100, "png")), // orthogonal gradient: far in dHash space
      (4L, "opaque payload one".getBytes("UTF-8")),
      (5L, "a different opaque payload".getBytes("UTF-8")),
      (6L, null.asInstanceOf[Array[Byte]])).toDF("id", "data") // skipped, never kills the task
    val pairs = Multimodal.phashPairs(rows, "id", "data", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L), pairs.mkString(", "))
    for ((i, j, d) <- pairs) {
      assert(i < j)
      assert(i != 6L && j != 6L, "NULL payload must be excluded from pairing")
      assert(d <= 3, s"pair ($i,$j) escaped the Hamming cap: $d")
    }
  }

  test("phashPairs matches the brute-force Hamming closure exactly (distinct-sig path)") {
    // The distinct-signature collapse must not change SEMANTICS: all pairs
    // at Hamming <= max, including equal-signature (Hamming 0) pairs from
    // byte-identical payloads, each exactly once.
    val payloads = Seq(
      1L -> "opaque payload one", 2L -> "opaque payload one", // identical -> Hamming 0
      3L -> "opaque payload one", // three-way identical group
      4L -> "a different opaque payload",
      5L -> "yet another thing entirely", 6L -> "and one more for volume")
    val rows = payloads.map { case (id, s) => (id, s.getBytes("UTF-8")) }.toDF("id", "data")
    val got = Multimodal.phashPairs(rows, "id", "data", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sig = payloads.toMap.view.mapValues(s => MediaCodec.dHash16(s.getBytes("UTF-8"))).toMap
    val want = (for {
      (i, _) <- payloads; (j, _) <- payloads if i < j
      d = java.lang.Long.bitCount(sig(i) ^ sig(j)) if d <= 3
    } yield (i, j, d)).toSet
    assert(got === want)
    // Multiplicity check: collect() above would hide duplicates in the Set;
    // count must equal the closure size too.
    assert(Multimodal.phashPairs(rows, "id", "data", maxHamming = 3).count() === want.size)
  }

  test("pHash index store: increments match the batch pairs; re-appends are idempotent") {
    val batch1 = Seq(
      (1L, blemished(100, 80, blemish = false)),
      (4L, "opaque payload one".getBytes("UTF-8"))).toDF("id", "data")
    val batch2 = Seq(
      (2L, blemished(100, 80, blemish = true)),
      (5L, "opaque payload one".getBytes("UTF-8"))).toDF("id", "data")
    val dir = java.nio.file.Files.createTempDirectory("phash_idx").toString + "/sigs"
    Multimodal.writePhashIndex(batch1, "id", "data", dir)
    Multimodal.appendPhashIndex(batch2, "id", "data", dir)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val stored = pairs(Multimodal.phashPairsFromIndex(spark, dir, maxHamming = 3))
    val direct = pairs(Multimodal.phashPairs(
      batch1.unionAll(batch2), "id", "data", maxHamming = 3))
    assert(stored === direct && stored.nonEmpty)
    // Near-pair (1,2) crosses the slice boundary; exact pair (4,5) too —
    // slice boundaries must be invisible to the banded join.
    assert(stored.exists(p => p._1 == 1L && p._2 == 2L), stored.mkString(", "))
    assert(stored.exists(p => p._1 == 4L && p._2 == 5L && p._3 == 0), stored.mkString(", "))
    // Replayed slice: distinct-on-read set algebra, nothing moves.
    Multimodal.appendPhashIndex(batch1, "id", "data", dir)
    assert(pairs(Multimodal.phashPairsFromIndex(spark, dir, maxHamming = 3)) === stored)
  }

  test("resizedWithFeatures: one codec pass equals the two-stage composition") {
    val rows = Seq(
      (1L, blemished(100, 80, blemish = false)),
      (2L, blemished(100, 80, blemish = true)),
      (3L, "opaque payload far over the byte budget -- gets truncated to the cap"
        .getBytes("UTF-8")),
      (4L, "tiny".getBytes("UTF-8"))).toDF("id", "data")
    val fused = Multimodal.resizedWithFeatures(rows, "id", "data", maxBytes = 48, dim = 8)
    assert(fused.columns.toSeq === Seq("id", "n_bytes_out", "features"))
    val got = fused.collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getSeq[Float](2).toSeq))).toMap
    // Reference: the standalone stages over the same payloads.
    val sizes = Multimodal.resized(
        rows.select(col("id"), col("data")).as[MediaRecord], maxBytes = 48)
      .map(r => (r.id, r.data.length)).collect().toMap
    val feats = Multimodal.withFeatures(rows, "id", "data", dim = 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    for ((id, (n, f)) <- got) {
      assert(n === sizes(id), s"id $id size")
      assert(f === feats(id), s"id $id features")
    }
    // The codec-runs-once plan gate: exactly ONE object-boundary stage —
    // composing the stages instead would deserialize the binary twice.
    val mapPartitionsNodes = fused.queryExecution.optimizedPlan.collect {
      case m: org.apache.spark.sql.catalyst.plans.logical.MapPartitions => m
    }
    assert(mapPartitionsNodes.size === 1)
  }

  test("audioWithFeatures: one codec pass equals the two-stage composition") {
    val rows = Seq(
      (1L, wavBytes(16000, 320)),
      (2L, "opaque non-audio payload".getBytes("UTF-8"))).toDF("id", "data")
    val fused = Multimodal.audioWithFeatures(rows, "id", "data", dim = 8)
    assert(fused.columns.toSeq ===
      Seq("id", "sample_rate", "channels", "n_frames", "format", "features"))
    val got = fused.collect().map(r => (r.getLong(0),
      (r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4),
        r.getSeq[Float](5).toSeq))).toMap
    val meta = Multimodal.withAudioMeta(rows, "id", "data")
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4)))).toMap
    val feats = Multimodal.withFeatures(rows, "id", "data", dim = 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toMap
    for ((id, (rate, ch, frames, fmt, f)) <- got) {
      assert((rate, ch, frames, fmt) === meta(id), s"id $id meta")
      assert(f === feats(id), s"id $id features")
    }
    // Real WAV decodes (not the fallback); opaque payload falls back.
    assert(got(1L)._1 === 16000 && got(1L)._2 === 1 && got(1L)._3 === 320)
    // Single codec boundary, as with resizedWithFeatures.
    val codecBoundaries = fused.queryExecution.optimizedPlan.collect {
      case d: org.apache.spark.sql.catalyst.plans.logical.DeserializeToObject
          if d.outputObjAttr.dataType.toString.contains("MediaRecord") => d
    }
    assert(codecBoundaries.size === 1)
  }

  test("pipeline_mm_prep plan: the codec boundary appears exactly once") {
    // The capstone composes store-read pairs (no codec), the union-find
    // keep (its own id-only mapPartitions stages — not codec), and the
    // fused resize+features stage — the payload BYTES must cross into
    // object space exactly once: one MediaRecord deserialization.
    val plan = SparkEntry.queries("pipeline_mm_prep")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    val codecBoundaries = plan.collect {
      case d: org.apache.spark.sql.catalyst.plans.logical.DeserializeToObject
          if d.outputObjAttr.dataType.toString.contains("MediaRecord") => d
    }
    assert(codecBoundaries.size === 1, plan.toString)
  }
}
