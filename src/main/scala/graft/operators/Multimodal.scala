package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY`
  * columns with typed metadata, plus distributed decode / feature-extract
  * / frame-sample operators.
  *
  * IMAGE decode is REAL ([[decodeImageFeatures]]: `javax.imageio`, pure
  * JVM — PNG/JPEG/BMP/GIF to pixel luminance histograms). AUDIO decode
  * is REAL ([[decodeAudioFeatures]]: `javax.sound.sampled`, pure JVM —
  * WAV/PCM, AIFF, AU to sample-domain RMS/peak features). VIDEO decode
  * is REAL for concatenated-still streams ([[decodeVideoFeatures]]: the
  * MJPEG idea with PNG frames — each frame is a full `javax.imageio`
  * still decode; no pure-JVM inter-frame codec like H.264 exists, so
  * GOP-predicted formats stay out of scope). Everything around the
  * kernels — schema, partition-wise batch processing via
  * `mapPartitions` on a typed Dataset, feature column shape, downstream
  * joinability — is shared; the three decoders prove swapping in a new
  * codec changes exactly one function.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long
  )

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** STUB decode: a 16-bin byte histogram, L1-normalized. A real decoder
    * would produce pixel/spectrogram tensors here; the Spark-side batch
    * shape (one partition of records in, one iterator of features out) is
    * exactly what a native decoder needs.
    */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 4) += 1f
      i += 1
    }
    val total = math.max(1, payload.length).toFloat
    hist.map(_ / total)
  }

  /** Distributed feature extraction: partition-wise map over the typed
    * Dataset — no driver collection, no shuffle; scales with input
    * partitions. Carries the payload size out so downstream consumers
    * don't have to join back to the (heavy) media table for it.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m =>
      MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, fakeDecodeFeatures(m.payload))))
  }

  final case class DecodedImageFeatures(
      media_id: Long,
      kind: String,
      decoded: Boolean, // true = real pixel decode; false = byte-histogram fallback
      width: Int,
      height: Int,
      features: Array[Float]
  )

  /** REAL image decode for the `image` kind via `javax.imageio` (pure
    * JVM — PNG/JPEG/BMP/GIF, no native codecs needed): the payload
    * decodes to pixels and the features are an L1-normalized `bins`-bin
    * LUMINANCE histogram (ITU-R BT.601 integer weights), with the actual
    * decoded width/height. Same partition-wise `mapPartitions` shape as
    * the stubbed [[extractFeatures]] — swapping decoders changes one
    * function, as that stub's contract promised. Non-image kinds and
    * payloads ImageIO cannot parse fall back to the byte histogram with
    * `decoded = false`, so one bad blob in a 100 TB corpus degrades that
    * row instead of failing the task (audio/video stay stubbed: no pure
    * JVM codec exists for them).
    */
  def decodeImageFeatures(
      media: Dataset[MediaRecord],
      bins: Int = 16
  ): Dataset[DecodedImageFeatures] = {
    import media.sparkSession.implicits._
    require(bins > 0 && bins <= 256)
    media.mapPartitions { it =>
      // the payload is already in memory — without this, ImageIO's default
      // disk cache spools EVERY blob through an executor temp file (one
      // create/write/delete per row, contention on java.io.tmpdir)
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img =
          if (m.kind != "image") None
          else
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload)))
            catch { case _: Throwable => None }
        img match {
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            val hist = new Array[Float](bins)
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              // row-bulk fetch: one ColorModel conversion call per ROW,
              // not per pixel
              im.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val rgb = row(x)
                val lum =
                  (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                hist(lum * bins / 256) += 1f
                x += 1
              }
              y += 1
            }
            val total = math.max(1, w * h).toFloat
            DecodedImageFeatures(m.media_id, m.kind, decoded = true, w, h, hist.map(_ / total))
          case None =>
            DecodedImageFeatures(m.media_id, m.kind, decoded = false, m.width, m.height,
              fakeDecodeFeatures(m.payload))
        }
      }
    }
  }

  final case class DecodedAudioFeatures(
      media_id: Long,
      kind: String,
      decoded: Boolean, // true = real PCM decode; false = byte-derived fallback
      sample_rate: Int,
      n_samples: Long,
      rms: Double,
      peak: Long
  )

  /** Minimal canonical WAV container (RIFF / PCM16 little-endian mono)
    * around raw bytes: the payload truncated to an even length becomes
    * the 16-bit sample stream. The builder half of the audio round trip —
    * [[decodeAudioFeatures]] parses it back through the real decoder.
    */
  def wavPcm16(raw: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    require(sampleRate > 0)
    val dataLen = raw.length & ~1
    val bb = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1) // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2) // byte rate = rate * blockAlign
    bb.putShort(2).putShort(16) // blockAlign, bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen).put(raw, 0, dataLen)
    bb.array()
  }

  /** REAL audio decode for the `audio` kind via `javax.sound.sampled`
    * (pure JVM — WAV/PCM, AIFF, AU; no native codecs needed): frames
    * decode to 16-bit samples and the features are the sample count, RMS
    * amplitude, and peak sample value, with the container's actual sample
    * rate. Replaces the byte-histogram stub as the audio leg the same way
    * [[decodeImageFeatures]] replaced the image leg: identical
    * partition-wise `mapPartitions` shape, per-row fallback (non-audio
    * kinds, non-PCM16-mono payloads, parse failures degrade to
    * byte-derived features with `decoded = false` instead of failing the
    * task).
    */
  def decodeAudioFeatures(media: Dataset[MediaRecord]): Dataset[DecodedAudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      def fallback: DecodedAudioFeatures = {
        var ss = 0L
        var peak = 0L
        var i = 0
        while (i < m.payload.length) {
          val v = (m.payload(i) & 0xff).toLong
          ss += v * v
          if (v > peak) peak = v
          i += 1
        }
        val n = m.payload.length.toLong
        DecodedAudioFeatures(m.media_id, m.kind, decoded = false, 0, n,
          if (n == 0) 0.0 else math.sqrt(ss.toDouble / n), peak)
      }
      if (m.kind != "audio") fallback
      else {
        try {
          val in = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new java.io.ByteArrayInputStream(m.payload))
          try {
            val fmt = in.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) fallback
            else {
              val bytes = in.readAllBytes()
              val n = bytes.length / 2
              var ss = 0L
              var peak = Long.MinValue
              var i = 0
              while (i < n) {
                val s: Long =
                  if (fmt.isBigEndian) ((bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)).toLong
                  else ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)).toLong
                ss += s * s
                if (s > peak) peak = s
                i += 1
              }
              DecodedAudioFeatures(m.media_id, m.kind, decoded = true, fmt.getSampleRate.toInt,
                n.toLong, if (n == 0) 0.0 else math.sqrt(ss.toDouble / n),
                if (n == 0) 0L else peak)
            }
          } finally in.close()
        } catch { case _: Throwable => fallback }
      }
    })
  }

  /** One 8-bit grayscale PNG frame from raw sample bytes (row-major
    * `w`×`h`, short input zero-padded): the builder half of the video
    * round trip. Pixels are written through the RASTER — no color-space
    * conversion — so PNG's losslessness makes decode-read-back exact.
    */
  def pngFrame(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, if (i < pixels.length) pixels(i) & 0xff else 0)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Concatenated-PNG video stream (the MJPEG layout with PNG stills):
    * every `frameW`×`frameH` slice of `raw` becomes one grayscale frame,
    * frames are byte-concatenated. Lossless by construction, so
    * [[decodeVideoFeatures]] recovers the exact source bytes — which is
    * what lets a SQL oracle replicate decoded features from the source.
    */
  def concatPngVideo(raw: Array[Byte], frameW: Int = 8, frameH: Int = 8): Array[Byte] = {
    val frameBytes = frameW * frameH
    val out = new java.io.ByteArrayOutputStream()
    raw.grouped(frameBytes).foreach(chunk => out.write(pngFrame(chunk, frameW, frameH)))
    out.toByteArray
  }

  final case class DecodedFrame(
      media_id: Long,
      kind: String,
      decoded: Boolean, // true = real per-frame pixel decode; false = byte-chunk fallback
      frame_idx: Int,
      width: Int,
      height: Int,
      mean_lum: Double, // mean pixel intensity of the frame
      delta_lum: Double // mean_lum - previous EMITTED frame's (0 for the first)
  )

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** REAL video decode for the `video` kind: the payload is split on PNG
    * signatures into frames, every `stride`-th frame is decoded through
    * `javax.imageio` and reduced to its mean pixel intensity (raster
    * samples — raw stored values, no color-model conversion) plus the
    * temporal delta against the previously emitted frame. Same
    * partition-wise shape and per-row degradation as the image/audio
    * decoders: non-video kinds, payloads with no parseable frames, or
    * any frame ImageIO rejects fall back to byte-chunk pseudo-frames
    * with `decoded = false` instead of failing the task.
    */
  def decodeVideoFeatures(
      media: Dataset[MediaRecord],
      stride: Int = 1,
      fallbackChunkBytes: Int = 64
  ): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    require(stride > 0 && fallbackChunkBytes > 0)
    media.flatMap { m =>
      def fallback: Seq[DecodedFrame] = {
        val chunks = m.payload.grouped(fallbackChunkBytes).toIndexedSeq
        var prev = 0.0
        chunks.indices.collect {
          case i if i % stride == 0 =>
            val c = chunks(i)
            val mean =
              if (c.isEmpty) 0.0 else c.map(b => (b & 0xff).toDouble).sum / fallbackChunkBytes
            val d = DecodedFrame(m.media_id, m.kind, decoded = false, i, 0, 0,
              mean, if (i == 0) 0.0 else mean - prev)
            prev = mean
            d
        }
      }
      if (m.kind != "video") fallback
      else {
        javax.imageio.ImageIO.setUseCache(false)
        // frame boundaries: every PNG signature starts a frame
        val starts = (0 to m.payload.length - PngSig.length)
          .filter(i => PngSig.indices.forall(j => m.payload(i + j) == PngSig(j)))
        if (starts.isEmpty) fallback
        else {
          val bounds = starts.zip(starts.drop(1) :+ m.payload.length)
          val decodedFrames = bounds.zipWithIndex.collect {
            case ((from, until), i) if i % stride == 0 =>
              val img =
                try
                  Option(javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(m.payload.slice(from, until))))
                catch { case _: Throwable => None }
              (i, img)
          }
          // one undecodable frame degrades the whole row to the fallback:
          // a half-decoded stream would emit deltas against missing frames
          if (decodedFrames.exists(_._2.isEmpty)) fallback
          else {
            var prev = 0.0
            decodedFrames.map { case (i, opt) =>
              val im = opt.get // emptiness excluded above
              val (w, h) = (im.getWidth, im.getHeight)
              val raster = im.getRaster
              var sum = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
                y += 1
              }
              val mean = if (w * h == 0) 0.0 else sum / (w * h)
              val d = DecodedFrame(m.media_id, m.kind, decoded = true, i, w, h,
                mean, if (i == 0) 0.0 else mean - prev)
              prev = mean
              d
            }
          }
        }
      }
    }
  }

  /** STUB frame sampling for "video" payloads: every `stride`-th
    * `chunkBytes`-sized chunk stands in for a decoded frame; the emitted
    * (id, frame_idx, hash) rows have the shape a real frame sampler would
    * produce. `chunkBytes` maps to a real decoder's GOP/keyframe interval.
    */
  def sampleFrames(
      media: Dataset[MediaRecord],
      stride: Int = 4,
      chunkBytes: Int = 1024
  ): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val chunks = m.payload.grouped(chunkBytes).toIndexedSeq
      chunks.indices.collect {
        case i if i % stride == 0 =>
          FrameSample(m.media_id, i, java.util.Arrays.hashCode(chunks(i)).toLong)
      }
    }
  }

  /** STUB resize: nearest-neighbor resampling of the payload to exactly
    * `targetBytes` — the byte-level stand-in for an image resize kernel
    * (a real decoder swaps the sampling loop for a pixel kernel over
    * decoded rows/cols). Deterministic, partition-wise, no shuffle.
    */
  def resizePayload(media: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(targetBytes > 0)
    media.mapPartitions(_.map { m =>
      val n = m.payload.length
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        out(i) = if (n == 0) 0 else m.payload((i.toLong * n / targetBytes).toInt)
        i += 1
      }
      m.copy(payload = out, width = targetBytes, height = 1)
    })
  }

  /** Wrap a text table as fake media records (test fixture helper): the
    * text bytes become the payload, metadata is derived deterministically.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRecord(id, kind, bytes, width = bytes.length % 640, height = bytes.length % 480,
          duration_ms = bytes.length.toLong)
      }
  }
}
