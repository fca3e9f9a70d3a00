package graft

import graft.multimodal.Multimodal
import graft.synth.Synth

/** Real javax.imageio codec path: the PNG encode → decode → resize →
  * re-encode → decode chain must reproduce the closed-form pixel values
  * of the synthetic generator exactly (PNG is lossless).
  */
class MultimodalImageSpec extends SparkSpec {

  private def expectedDims(i: Long): (Int, Int) =
    (8 + (Synth.h(i, 30L) % 9L).toInt, 8 + (Synth.h(i, 31L) % 9L).toInt)

  private def rgb(i: Long, p: Int): (Long, Long, Long) =
    (Synth.h(i, 100000L + p) % 256L,
      Synth.h(i, 200000L + p) % 256L,
      Synth.h(i, 300000L + p) % 256L)

  private def expectedChecksum(i: Long): Long = {
    val (w, h) = expectedDims(i)
    (0 until w * h).map { p =>
      val (r, g, b) = rgb(i, p)
      (p + 1).toLong * (r + 2 * g + 4 * b)
    }.sum
  }

  test("decode recovers generator dims and exact pixel checksum") {
    val got = Multimodal.decodeImages(Multimodal.syntheticImages(spark, 12L))
      .collect().map(d => d.media_id -> d).toMap
    assert(got.size == 12)
    (0L until 12L).foreach { i =>
      val (w, h) = expectedDims(i)
      assert(got(i).width == w && got(i).height == h, s"dims of $i")
      assert(got(i).checksum == expectedChecksum(i), s"checksum of $i")
    }
  }

  test("nearest-neighbor resize + re-encode matches the closed form") {
    val got = Multimodal.decodeImages(
      Multimodal.resizeImages(Multimodal.syntheticImages(spark, 12L), 8, 8))
      .collect().map(d => d.media_id -> d.checksum).toMap
    (0L until 12L).foreach { i =>
      val (w, h) = expectedDims(i)
      val want = (0 until 64).map { q =>
        val p = ((q / 8) * h / 8) * w + ((q % 8) * w / 8)
        val (r, g, b) = rgb(i, p)
        (q + 1).toLong * (r + 2 * g + 4 * b)
      }.sum
      assert(got(i) == want, s"resized checksum of $i")
    }
  }

  test("unparseable bytes fall back to the stub (pipeline keeps flowing)") {
    val media = Multimodal.syntheticMedia(spark, 9L) // content = hash bytes, not PNG
    val resized = Multimodal.resizeImages(media, 8, 8).collect()
    assert(resized.filter(_.kind == "image").forall(r => r.width == 8 && r.height == 8))
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(feats.length == 9 && feats.forall(_.feature.length == 8))
    // real images yield pixel-statistic features in [-0.5, 0.5]
    val imgFeats = Multimodal.extractFeatures(Multimodal.syntheticImages(spark, 4L), dim = 8)
      .collect()
    assert(imgFeats.forall(_.feature.forall(f => f >= -0.5f && f <= 0.5f)))
  }

  test("WAV decode recovers generator samples bit-exactly (RIFF round trip)") {
    val got = Multimodal.decodeAudio(Multimodal.syntheticWavs(spark, 12L))
      .collect().map(d => d.media_id -> d).toMap
    assert(got.size == 12)
    (0L until 12L).foreach { i =>
      val ns = 64 + (Synth.h(i, 40L) % 129L).toInt
      val want = (0 until ns).map { p =>
        (p + 1).toLong * (Synth.h(i, 500000L + p) % 65536L)
      }.sum
      assert(got(i).n_samples == ns, s"n_samples of $i")
      assert(got(i).sample_rate == 8000, s"rate of $i")
      assert(got(i).checksum == want, s"sample checksum of $i")
    }
  }

  test("audio features are real waveform statistics; non-WAV bytes hit the stub") {
    val wavFeats = Multimodal.extractFeatures(Multimodal.syntheticWavs(spark, 4L), dim = 8)
      .collect()
    assert(wavFeats.length == 4 && wavFeats.forall(_.feature.length == 8))
    assert(wavFeats.forall(_.feature.forall(f => f >= -0.5f && f <= 0.5f)))
    // hand-check clip 0's bucketed mean-abs amplitude
    val ns = 64 + (Synth.h(0L, 40L) % 129L).toInt
    val samples = Array.tabulate(ns)(p => (Synth.h(0L, 500000L + p) % 65536L - 32768L).toShort)
    val want = Multimodal.AudioCodec.bucketAmp(samples, 8)
    val got = wavFeats.find(_.media_id == 0L).get.feature
    assert(got.sameElements(want))
    // hash-byte "audio" rows are not RIFF — they must fall back to the stub
    val stub = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(spark, 6L).filter((r: Multimodal.MediaRow) => r.kind == "audio"),
      dim = 8).collect()
    assert(stub.nonEmpty && stub.forall(_.feature.length == 8))
  }
}
