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
}
