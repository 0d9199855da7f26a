package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode measures real PNG bytes per-partition (round-trip is an " +
      "identity on dims and pixel content)") {
    val docs = Seq((7L, 20, 17), (8L, 16, 16)).map { case (id, w, h) =>
      (id, Multimodal.encodePng(id, w, h))
    }.toDF("doc_id", "payload")
    val meta = Multimodal.decode(docs, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(meta.length == 2)
    val r1 = meta(0)
    assert(r1.getLong(0) == 7L)
    assert(r1.getInt(1) == 20 && r1.getInt(2) == 17) // measured, not declared
    assert(r1.getLong(3) == 20L * 17)
    val expectSum = (for (y <- 0 until 17; x <- 0 until 20)
      yield Multimodal.pixelValue(7L, x, y).toLong).sum
    assert(r1.getLong(4) == expectSum)
  }

  test("decode fails loud on undecodable payload bytes") {
    val docs = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "payload")
    val e = intercept[Exception] {
      Multimodal.decode(docs, "doc_id", "payload").collect()
    }
    assert(e.getMessage != null)
  }

  test("decodeImage reads a foreign (non-generator) image too, and " +
      "measures the documented channel") {
    // a 3×2 PURE-RED RGB PNG built directly, bypassing encodePng — the
    // decoder must not depend on the generator's pixel formula, and a
    // non-gray color pins WHICH channel is summed (red: 255 per pixel;
    // summing blue or green would read 0)
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, 0xff0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val m = Multimodal.decodeImage(99L, bos.toByteArray)
    assert(m.width == 3 && m.height == 2 && m.n_pixels == 6 &&
      m.pixel_sum == 6L * 255)
  }

  test("frame sampling explodes stride-2 frame indices off the metadata " +
      "column, after decode") {
    val meta = Seq((1L, 8), (2L, 1)).toDF("doc_id", "frames")
    val frames = Multimodal.sampleFrames(meta, every = 2)
    assert(frames.where(col("doc_id") === 1)
      .select("frame_idx").as[Int].collect().toSeq == Seq(0, 2, 4, 6))
    assert(frames.where(col("doc_id") === 2)
      .select("frame_idx").as[Int].collect().toSeq == Seq(0))
  }

  test("WAV round-trip: encode produces a canonical RIFF payload the " +
      "decoder measures exactly; corrupt payloads fail loud") {
    val meta = Multimodal.decodeWav(7L, Multimodal.encodeWav(7L, 100, 13))
    assert(meta.n_samples == 100L)
    val expectPeak = (0 until 100)
      .map(k => math.abs(Multimodal.sampleValue(7L, k, 13)).toLong).max
    val expectEnergy = (0 until 100)
      .map { k => val s = Multimodal.sampleValue(7L, k, 13).toLong; s * s }
      .sum
    assert(meta.peak == expectPeak && meta.energy == expectEnergy)
    // corrupt magic
    val bad = Multimodal.encodeWav(7L, 10, 13)
    bad(0) = 'X'.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeWav(7L, bad) }
    // truncated header
    intercept[Exception] {
      Multimodal.decodeWav(7L, Array[Byte](1, 2, 3))
    }
  }
}
