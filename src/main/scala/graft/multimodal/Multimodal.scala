package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.synth.Synth

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The **image** path is real: [[ImageCodec]] decodes/encodes PNG (or
  * any `javax.imageio`-readable format — BMP, GIF, JPEG) with the JDK's
  * built-in ImageIO, resizes by deterministic nearest-neighbor, and
  * extracts grid-luminance features from actual pixels. The **audio**
  * path is real for WAV/PCM: [[AudioCodec]] encodes/decodes 16-bit
  * signed PCM in RIFF containers with `javax.sound.sampled` and
  * extracts bucketed waveform-amplitude features from actual samples.
  * Compressed codecs (MP3/AAC/video — no FFmpeg in this container) stay
  * STUBBED behind [[DecodeStub]]: it emits deterministic hash-derived
  * bytes and features so tests can assert exact values. Rows whose
  * bytes the JDK cannot parse also fall back to the stub, so synthetic
  * non-media byte streams keep flowing through the same pipeline.
  *
  * Batching note: in PySpark this plane would be `mapInPandas` with Arrow
  * batches; the Scala-native equivalent is `Dataset.mapPartitions` over a
  * typed iterator — one JVM-side batch per partition, no per-row setup.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long
  )

  final case class Feature(media_id: Long, kind: String, dim: Int, feature: Array[Float])

  final case class Decoded(media_id: Long, width: Int, height: Int, checksum: Long)

  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, content: Array[Byte])

  /** Deterministic synthetic media table (content bytes = hash stream). */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n).as[Long].map { i =>
      val kind = (i % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val len = 64 + (Synth.h(i, 1L) % 192L).toInt
      val bytes = Array.tabulate[Byte](len)(j => (Synth.h(i, j.toLong + 2L) % 256L).toByte)
      MediaRow(i, kind, bytes,
        width = 16 + (Synth.h(i, 3L) % 64L).toInt,
        height = 16 + (Synth.h(i, 4L) % 64L).toInt,
        duration_ms = if (kind == "image") 0L else 1000L + Synth.h(i, 5L) % 60000L)
    }
  }

  /** Real image codec on the JDK's `javax.imageio` — no external libs.
    * Decode is exact for lossless formats (PNG/BMP/GIF), so the
    * per-pixel checksums below are closed-form predictable from the
    * synthetic generator and oracle-checkable end-to-end through an
    * encode → decode → resize → encode → decode chain.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    // executors must not spill ImageIO scratch files to disk per call
    ImageIO.setUseCache(false)

    /** None when the bytes are not a parseable image (ImageIO sniffs the
      * container signature) — callers fall back to [[DecodeStub]].
      */
    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Deterministic nearest-neighbor resample: out(x,y) takes source
      * pixel (x·W/w, y·H/h) under integer floor division — the same
      * closed form the SQL oracle computes.
      */
    def resizeNearest(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out.setRGB(x, y, img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
          x += 1
        }
        y += 1
      }
      out
    }

    /** Exact pixel checksum Σ (p+1)·(r + 2g + 4b) over row-major pixel
      * index p — order-sensitive, so it catches transposed/flipped
      * decodes, not just value errors.
      */
    def checksum(img: BufferedImage): Long = {
      var sum = 0L
      var p = 0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += (p + 1).toLong *
            (((rgb >> 16) & 0xFF) + 2 * ((rgb >> 8) & 0xFF) + 4 * (rgb & 0xFF))
          p += 1
          x += 1
        }
        y += 1
      }
      sum
    }

    /** dim-bucket mean-luminance feature over row-major pixels (bucket
      * d covers p ∈ [d·n/dim, (d+1)·n/dim)) — a real pixel statistic in
      * the same shape as the stub's hash features.
      */
    def gridLuma(img: BufferedImage, dim: Int): Array[Float] = {
      val wpx = img.getWidth
      val n = wpx * img.getHeight
      val acc = new Array[Double](dim)
      val cnt = new Array[Int](dim)
      var p = 0
      while (p < n) {
        val rgb = img.getRGB(p % wpx, p / wpx)
        val luma = ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        val d = (p.toLong * dim / n).toInt
        acc(d) += luma / 765.0
        cnt(d) += 1
        p += 1
      }
      Array.tabulate(dim)(d => if (cnt(d) == 0) 0f else ((acc(d) / cnt(d)) - 0.5).toFloat)
    }
  }

  /** Real audio codec on the JDK's `javax.sound.sampled` — WAV (RIFF)
    * containers with 16-bit signed PCM are encoded/decoded natively by
    * the JDK, no external libs. PCM is lossless, so decoded samples are
    * bit-exact against the synthetic generator and the sample checksum
    * below is closed-form predictable in SQL. Compressed codecs (MP3,
    * AAC, video) have no JDK decoder and stay on [[DecodeStub]].
    */
  object AudioCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Encode 16-bit signed little-endian mono PCM as a WAV container. */
    def encodeWav(samples: Array[Short], sampleRate: Float): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xFF).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** None when the bytes are not a parseable 16-bit signed mono PCM
      * container — callers fall back to [[DecodeStub]].
      */
    def decodePcm16(bytes: Array[Byte]): Option[(Float, Array[Short])] =
      try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
          f.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          val ss = new Array[Short](n)
          var i = 0
          while (i < n) {
            ss(i) =
              if (f.isBigEndian) (((raw(2 * i) & 0xFF) << 8) | (raw(2 * i + 1) & 0xFF)).toShort
              else ((raw(2 * i) & 0xFF) | ((raw(2 * i + 1) & 0xFF) << 8)).toShort
            i += 1
          }
          Some((f.getSampleRate, ss))
        }
      } catch { case _: Exception => None }

    /** dim-bucket mean absolute amplitude (bucket d covers samples
      * p ∈ [d·n/dim, (d+1)·n/dim)) — a real waveform statistic in the
      * same shape as [[ImageCodec.gridLuma]].
      */
    def bucketAmp(samples: Array[Short], dim: Int): Array[Float] = {
      val n = samples.length
      val acc = new Array[Double](dim)
      val cnt = new Array[Int](dim)
      var p = 0
      while (p < n) {
        val d = (p.toLong * dim / n).toInt
        acc(d) += math.abs(samples(p).toDouble) / 32768.0
        cnt(d) += 1
        p += 1
      }
      Array.tabulate(dim)(d => if (cnt(d) == 0) 0f else ((acc(d) / cnt(d)) - 0.5).toFloat)
    }

    /** Exact order-sensitive sample checksum Σ (p+1)·(s_p + 32768) —
      * the audio analog of [[ImageCodec.checksum]].
      */
    def checksum(samples: Array[Short]): Long = {
      var sum = 0L
      var p = 0
      while (p < samples.length) {
        sum += (p + 1).toLong * (samples(p).toLong + 32768L)
        p += 1
      }
      sum
    }
  }

  /** STUB decoder: deterministic pseudo-decode. A real implementation
    * decodes the codec bytes; this derives stable values from content so
    * the pipeline shape (batch in, typed batch out) is fully exercised.
    */
  object DecodeStub {
    def features(row: MediaRow, dim: Int): Array[Float] = {
      val h0 = row.content.foldLeft(1469598103934665603L)((a, b) => (a ^ b) * 1099511628211L)
      Array.tabulate(dim)(d => (((h0 >>> (d % 48)) & 0xFFFFL).toFloat / 65535.0f) - 0.5f)
    }
    def resized(row: MediaRow, w: Int, h: Int): Array[Byte] =
      Array.tabulate[Byte](w * h / 8 + 1)(j =>
        row.content(j % row.content.length))
    def frames(row: MediaRow, everyMs: Long): Seq[Frame] = {
      val n = math.max(1L, row.duration_ms / everyMs).toInt
      (0 until math.min(n, 16)).map(f =>
        Frame(row.media_id, f, f * everyMs,
          Array.tabulate[Byte](32)(j => row.content((f + j) % row.content.length))))
    }
  }

  /** Deterministic synthetic *real* PNG table: pixel (p = y·W + x) of
    * image i is rgb = (h(i,1e5+p)%256, h(i,2e5+p)%256, h(i,3e5+p)%256),
    * dims 8..16 — every byte of the PNG container comes out of
    * `ImageIO.write`, so downstream decode exercises the real codec and
    * the SQL oracle predicts pixels from the hash formula alone.
    */
  def syntheticImages(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n).as[Long].map { i =>
      val w = 8 + (Synth.h(i, 30L) % 9L).toInt
      val h = 8 + (Synth.h(i, 31L) % 9L).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0
      while (p < w * h) {
        val r = (Synth.h(i, 100000L + p) % 256L).toInt
        val g = (Synth.h(i, 200000L + p) % 256L).toInt
        val b = (Synth.h(i, 300000L + p) % 256L).toInt
        img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
        p += 1
      }
      MediaRow(i, "image", ImageCodec.encodePng(img), w, h, 0L)
    }
  }

  final case class AudioDecoded(media_id: Long, n_samples: Int, sample_rate: Int, checksum: Long)

  /** Deterministic synthetic *real* WAV table: sample p of clip i is
    * s_p = h(i, 5·10⁵+p) % 65536 − 32768 (16-bit signed), n_samples =
    * 64 + h(i,40) % 129, rate 8000 Hz — every byte of the RIFF
    * container comes out of `AudioSystem.write`, so downstream decode
    * exercises the real codec and the SQL oracle predicts samples from
    * the hash formula alone.
    */
  def syntheticWavs(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n).as[Long].map { i =>
      val ns = 64 + (Synth.h(i, 40L) % 129L).toInt
      val samples = Array.tabulate[Short](ns)(p =>
        (Synth.h(i, 500000L + p) % 65536L - 32768L).toShort)
      MediaRow(i, "audio", AudioCodec.encodeWav(samples, 8000f),
        width = 0, height = 0, duration_ms = ns.toLong * 1000L / 8000L)
    }
  }

  /** Real audio decode: (media_id, sample count, rate, exact sample
    * checksum). Rows the JDK cannot parse as 16-bit PCM are dropped —
    * decode is the gate, mirroring [[decodeImages]].
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      AudioCodec.decodePcm16(r.content).map { case (rate, ss) =>
        AudioDecoded(r.media_id, ss.length, rate.toInt, AudioCodec.checksum(ss))
      }
    })
  }

  /** Real decode: (media_id, decoded width/height, exact pixel
    * checksum). Rows ImageIO cannot parse are dropped — decode is the
    * gate, not a best-effort guess.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      ImageCodec.decode(r.content).map(img =>
        Decoded(r.media_id, img.getWidth, img.getHeight, ImageCodec.checksum(img)))
    })
  }

  /** Feature extraction: batched per-partition map → (media_id, kind,
    * dim, feature float[]). Parseable images get real grid-luminance
    * pixel features; audio/video (and unparseable bytes) the stub.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val feat = r.kind match {
        case "image" => ImageCodec.decode(r.content) match {
          case Some(img) => ImageCodec.gridLuma(img, dim)
          case None => DecodeStub.features(r, dim)
        }
        case "audio" => AudioCodec.decodePcm16(r.content) match {
          case Some((_, ss)) => AudioCodec.bucketAmp(ss, dim)
          case None => DecodeStub.features(r, dim)
        }
        case _ => DecodeStub.features(r, dim)
      }
      Feature(r.media_id, r.kind, dim, feat)
    })
  }

  /** Image resize stage (images only; pass-through metadata update).
    * Parseable images go through the real decode → nearest-neighbor
    * resample → PNG re-encode chain; unparseable bytes keep the stub.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind == "image") {
        val bytes = ImageCodec.decode(r.content) match {
          case Some(img) => ImageCodec.encodePng(ImageCodec.resizeNearest(img, w, h))
          case None => DecodeStub.resized(r, w, h)
        }
        r.copy(content = bytes, width = w, height = h)
      } else r
    })
  }

  /** Frame sampling for video/audio rows: one output row per sampled
    * frame (flatMap — the Unfold/explode shape).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 5000L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter((r: MediaRow) => r.kind != "image")
      .mapPartitions(_.flatMap(r => DecodeStub.frames(r, everyMs)))
  }

  /** Join extracted features back onto a metadata DataFrame (the
    * ADD_COLUMN shape from the session plane, `dag_utils.py:912`).
    */
  def withFeatures(meta: DataFrame, feats: Dataset[Feature]): DataFrame =
    meta.join(feats.toDF.select(col("media_id"), col("feature")), Seq("media_id"), "left")
}
