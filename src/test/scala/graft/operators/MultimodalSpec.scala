package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromDocuments(
    spark, spark.read.parquet(s"$sf/documents.parquet").limit(60))

  test("binary payload round-trips through the typed Dataset") {
    val r = media.filter(_.media_id == 0L).head()
    assert(new String(r.payload, "UTF-8").startsWith("the fast key"))
    assert(Set("image", "audio", "video").contains(r.kind))
  }

  test("feature extraction: fixed shape, L1-normalized, distributed (no collect)") {
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 60)
    rows.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-5)
    }
    // determinism: same payload → same features
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
  }

  test("frame sampling strides over chunks of video payloads only") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    val kinds = media.collect().map(m => m.media_id -> m.kind).toMap
    assert(frames.forall(f => kinds(f.media_id) == "video"))
  }

  /** A real PNG, generated in-memory: 2×2 with two black and two white
    * pixels (known luminance histogram).
    */
  private def pngFixture(): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    im.setRGB(0, 0, 0x000000); im.setRGB(1, 0, 0xffffff)
    im.setRGB(0, 1, 0x000000); im.setRGB(1, 1, 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  test("real image decode: a PNG payload decodes to pixel features via javax.imageio") {
    val png = pngFixture()
    val ds = Seq(
      Multimodal.MediaRecord(1L, "image", png, 0, 0, 0L),
      Multimodal.MediaRecord(2L, "image", Array[Byte](1, 2, 3), 7, 9, 0L), // not an image
      Multimodal.MediaRecord(3L, "audio", png, 0, 0, 0L) // wrong kind: no decode
    ).toDS()
    val out = Multimodal.decodeImageFeatures(ds).collect().map(f => f.media_id -> f).toMap

    val decoded = out(1L)
    assert(decoded.decoded && decoded.width == 2 && decoded.height == 2)
    // luminance: 2 black pixels (bin 0) + 2 white (bin 15), L1-normalized
    assert(decoded.features.length == 16)
    assert(math.abs(decoded.features(0) - 0.5f) < 1e-6)
    assert(math.abs(decoded.features(15) - 0.5f) < 1e-6)
    assert(decoded.features.slice(1, 15).forall(_ == 0f))

    // unparseable payload degrades to the byte-histogram fallback, keeps metadata
    assert(!out(2L).decoded && out(2L).width == 7 && out(2L).height == 9)
    assert(math.abs(out(2L).features.map(_.toDouble).sum - 1.0) < 1e-5)
    // non-image kinds never go through ImageIO even if the bytes are a PNG
    assert(!out(3L).decoded)
  }

  test("audio decode: WAV round trip with known samples, signedness, fallback") {
    import spark.implicits._
    // PCM16LE bytes 01 00 02 00 → samples 1, 2 → rms = sqrt(2.5), peak = 2
    val rec = Multimodal.MediaRecord(
      1L, "audio", Multimodal.wavPcm16(Array[Byte](1, 0, 2, 0), 8000), 0, 0, 0L)
    val out = Multimodal.decodeAudioFeatures(Seq(rec).toDS()).collect().head
    assert(out.decoded && out.sample_rate == 8000 && out.n_samples == 2L)
    assert(math.abs(out.rms - math.sqrt(2.5)) < 1e-9 && out.peak == 2L)
    // FF FF → sample -1: the high byte's sign must propagate
    val neg = rec.copy(media_id = 2L, payload = Multimodal.wavPcm16(Array[Byte](-1, -1)))
    val o2 = Multimodal.decodeAudioFeatures(Seq(neg).toDS()).collect().head
    assert(o2.decoded && o2.n_samples == 1L && o2.peak == -1L && math.abs(o2.rms - 1.0) < 1e-9)
    // odd-length raw data truncates to whole samples; junk payloads degrade
    val odd = rec.copy(media_id = 3L, payload = Multimodal.wavPcm16(Array[Byte](1, 0, 9)))
    assert(Multimodal.decodeAudioFeatures(Seq(odd).toDS()).collect().head.n_samples == 1L)
    val junk = rec.copy(media_id = 4L, payload = Array[Byte](1, 2, 3))
    val o4 = Multimodal.decodeAudioFeatures(Seq(junk).toDS()).collect().head
    assert(!o4.decoded)
    // non-audio kinds never reach the sound API even with valid WAV bytes
    val img = rec.copy(media_id = 5L, kind = "image")
    assert(!Multimodal.decodeAudioFeatures(Seq(img).toDS()).collect().head.decoded)
  }

  test("video decode: concatenated-PNG round trip recovers exact frame means and deltas") {
    import spark.implicits._
    // 100 bytes → frames of 64: frame0 = bytes 0..63, frame1 = bytes
    // 64..99 zero-padded to 64
    val raw = Array.tabulate[Byte](100)(i => ((i * 7 + 11) % 128).toByte)
    val payload = Multimodal.concatPngVideo(raw, 8, 8)
    val media = Seq(Multimodal.MediaRecord(1L, "video", payload, 8, 8, 0L)).toDS()
    val frames = Multimodal.decodeVideoFeatures(media).collect().sortBy(_.frame_idx)
    assert(frames.length == 2 && frames.forall(f => f.decoded && f.width == 8 && f.height == 8))
    val mean0 = raw.take(64).map(b => (b & 0xff).toDouble).sum / 64
    val mean1 = raw.drop(64).map(b => (b & 0xff).toDouble).sum / 64 // pad zeros count
    assert(frames(0).mean_lum == mean0 && frames(0).delta_lum == 0.0)
    assert(frames(1).mean_lum == mean1 && frames(1).delta_lum == mean1 - mean0)
  }

  test("video decode: stride samples frames; deltas compare emitted frames") {
    import spark.implicits._
    val raw = Array.tabulate[Byte](64 * 5)(i => (i / 64 * 10).toByte) // frame f = constant 10f
    val media = Seq(Multimodal.MediaRecord(2L, "video",
      Multimodal.concatPngVideo(raw, 8, 8), 8, 8, 0L)).toDS()
    val frames = Multimodal.decodeVideoFeatures(media, stride = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(frames.map(_.mean_lum).toSeq == Seq(0.0, 20.0, 40.0))
    assert(frames.map(_.delta_lum).toSeq == Seq(0.0, 20.0, 20.0)) // vs previous EMITTED
  }

  test("video decode: garbage payloads and non-video kinds degrade to byte-chunk fallback") {
    import spark.implicits._
    val garbage = Array.tabulate[Byte](130)(i => (i % 97).toByte)
    val media = Seq(
      Multimodal.MediaRecord(3L, "video", garbage, 0, 0, 0L), // no PNG signature
      Multimodal.MediaRecord(4L, "audio", Multimodal.concatPngVideo(garbage), 0, 0, 0L)
    ).toDS()
    val rows = Multimodal.decodeVideoFeatures(media, fallbackChunkBytes = 64).collect()
    assert(rows.nonEmpty && rows.forall(!_.decoded))
    val g3 = rows.filter(_.media_id == 3L)
    assert(g3.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2))
    assert(g3.find(_.frame_idx == 0).get.mean_lum ==
      garbage.take(64).map(b => (b & 0xff).toDouble).sum / 64)
  }

  test("resize: exact target size, nearest-neighbor samples from the source") {
    val resized = Multimodal.resizePayload(media, targetBytes = 64).collect()
    assert(resized.forall(_.payload.length == 64))
    // first sampled byte is the source's first byte; identity when n == target
    val src = media.collect().map(m => m.media_id -> m.payload).toMap
    resized.foreach { r =>
      assert(r.payload(0) == src(r.media_id)(0))
      assert(r.width == 64 && r.height == 1)
    }
  }
}
