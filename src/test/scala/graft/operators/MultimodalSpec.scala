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
