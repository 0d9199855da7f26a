package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, decoded per-partition.
  *
  * The decode is REAL: payloads are PNG byte streams and `decodeImage`
  * runs them through `javax.imageio` (bundled with the JDK — no external
  * codec dependency), measuring width/height/pixel content from the
  * decoded raster. Properties a container can't measure from pixels
  * (e.g. a video's frame count) travel as typed METADATA columns next to
  * the binary — the schema contract for multimodal tables.
  *
  * Scale shape: the binary column never shuffles post-decode (explode
  * frame indices AFTER decode), and decoding runs inside `mapPartitions`
  * so a production codec can allocate its native context once per
  * partition and stream the partition's rows through it.
  */
object Multimodal {

  /** Decoded-image metadata row: measured (not declared) properties. */
  final case class ImageMeta(
      doc_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      pixel_sum: Long)

  /** Deterministic grayscale value for pixel (x, y) of document `id` —
    * the synthetic-image content generator. Pure integer arithmetic so
    * an external oracle engine can replay the expected `pixel_sum` of a
    * decoded image relationally.
    */
  def pixelValue(id: Long, x: Int, y: Int): Int =
    ((x * 31L + y * 17L + id) % 256L).toInt

  /** Encode a deterministic `w`×`h` grayscale PNG for document `id`.
    * PNG is lossless, so decoding returns the exact [[pixelValue]]
    * raster — encode∘decode is an identity on the measured properties.
    */
  def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = pixelValue(id, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real image decode: parse the payload with `javax.imageio`, measure
    * dimensions and the sum of the red channel over the raster. Fails
    * loud on undecodable bytes — silently skipping corrupt media would
    * under-count a training corpus without a trace.
    */
  def decodeImage(docId: Long, payload: Array[Byte]): ImageMeta = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, s"doc $docId: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s += (img.getRGB(x, y) >> 16) & 0xff // red channel
        x += 1
      }
      y += 1
    }
    ImageMeta(docId, w, h, w.toLong * h, s)
  }

  /** (id, payload) → [[ImageMeta]], decoding per partition. The
    * mapPartitions boundary is where a heavier codec would allocate its
    * native context once and reuse it across the partition's rows
    * (ImageIO itself is stateless, but the contract point stands).
    */
  def decode(payloads: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // heavier codec: init decoder context here, once per partition
        it.map { case (id, bytes) => decodeImage(id, bytes) }
      }
      .toDF()
  }

  /** Frame-sampling: one output row per sampled frame index, stride
    * `every`, driven by a `frames` metadata column — the explode
    * happens AFTER decode so only metadata (not pixels) shuffles.
    */
  def sampleFrames(meta: DataFrame, every: Int = 2): DataFrame =
    meta.withColumn("frame_idx",
      explode(sequence(lit(0), col("frames") - 1, lit(every))))

  // -------------------------------------------------------------------
  // Audio leg: real PCM-in-WAV bytes (RIFF header + 16-bit LE mono
  // samples), same architecture as the image leg — a deterministic
  // generator whose formulas an oracle can replay, and a REAL binary
  // decoder (magic validation, header parse, sample scan) the Spark
  // side must run to measure the same numbers back out.
  // -------------------------------------------------------------------

  /** Deterministic sample k of document `id`'s waveform — int16,
    * SQL-replayable: ((id·31 + k·seed + 7) mod 65536) − 32768.
    */
  def sampleValue(id: Long, k: Int, seed: Int): Int =
    (((id * 31L + k.toLong * seed + 7L) % 65536L) - 32768L).toInt

  /** Encode a canonical 44-byte-header PCM WAV (mono, 16-bit LE,
    * 8 kHz) holding `nSamples` generated samples.
    */
  def encodeWav(id: Long, nSamples: Int, seed: Int): Array[Byte] = {
    val dataBytes = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000) // rate, byte rate
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var k = 0
    while (k < nSamples) {
      bb.putShort(sampleValue(id, k, seed).toShort)
      k += 1
    }
    bb.array()
  }

  /** Measured (not declared) audio properties: sample count from the
    * data chunk, peak amplitude, total energy (sum of squares — exact
    * in a long for any realistic clip).
    */
  final case class AudioMeta(
      doc_id: Long, n_samples: Long, peak: Long, energy: Long)

  /** Real WAV decode: validate the RIFF/WAVE magic and PCM format,
    * then scan the sample words. Throws on malformed payloads — a
    * corrupt media column should fail loud, not feed NaN features.
    */
  def decodeWav(docId: Long, payload: Array[Byte]): AudioMeta = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
    }
    require(ascii(4) == "RIFF", s"doc $docId: not a RIFF payload")
    bb.getInt // riff size
    require(ascii(4) == "WAVE" && ascii(4) == "fmt ",
      s"doc $docId: not a WAVE/fmt payload")
    require(bb.getInt == 16 && bb.getShort == 1,
      s"doc $docId: not canonical PCM")
    val channels = bb.getShort
    bb.getInt; bb.getInt; bb.getShort // rate, byte rate, block align
    val bits = bb.getShort
    require(channels == 1 && bits == 16,
      s"doc $docId: expected 16-bit mono, got $bits-bit $channels-ch")
    require(ascii(4) == "data", s"doc $docId: missing data chunk")
    val dataBytes = bb.getInt
    val n = dataBytes / 2
    var peak = 0L
    var energy = 0L
    var k = 0
    while (k < n) {
      val s = bb.getShort.toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      energy += s * s
      k += 1
    }
    AudioMeta(docId, n.toLong, peak, energy)
  }

  /** (id, payload) → [[AudioMeta]], decoding per partition (same codec
    * boundary as [[decode]]).
    */
  def decodeAudio(
      payloads: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeWav(id, bytes) })
      .toDF()
  }
}
