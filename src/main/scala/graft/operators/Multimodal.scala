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
}
