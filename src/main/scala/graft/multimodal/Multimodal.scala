package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.synth.Synth

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, batched per-partition
  * processing, output shapes — is real and tested; the actual
  * codec work is STUBBED behind [[DecodeStub]] (no image/audio libraries
  * ship in this container): it emits deterministic hash-derived bytes and
  * features so tests can assert exact values. Swap `DecodeStub` for a
  * real codec (JNI/FFmpeg/ImageIO) without touching the pipeline.
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

  /** Feature extraction: batched per-partition map → (media_id, kind,
    * dim, feature float[]).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => Feature(r.media_id, r.kind, dim, DecodeStub.features(r, dim))))
  }

  /** Image resize stage (images only; pass-through metadata update). */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind == "image") r.copy(content = DecodeStub.resized(r, w, h), width = w, height = h)
      else r
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
