package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, decoded per-partition.
  *
  * The container has no image/audio codecs, so `decodeFake` is a
  * clearly-marked deterministic stand-in (header arithmetic on the raw
  * bytes); the Spark-side shape — binary column, case-class schema,
  * `mapPartitions` over a Dataset so codec state could be initialized
  * once per partition and rows stream through in batches — is the real,
  * tested contract a production codec would drop into.
  */
object Multimodal {

  /** Decoded-media metadata row. `frames` drives downstream per-frame
    * explode (frame-sampling); width/height drive resize planning.
    */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      frames: Int)

  /** STUB — stands in for an image/video header decode. Deterministic
    * arithmetic over the payload so tests and the DuckDB oracle can
    * replay it; a real build replaces the body with e.g. a JPEG/WAV
    * header parse, keeping the signature.
    */
  def decodeFake(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val first = if (payload.isEmpty) 0 else payload(0) & 0xff
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = 16 + (n % 64).toInt,
      height = 16 + (first % 64),
      frames = 1 + (n % 8).toInt)
  }

  /** (id, payload) → MediaMeta, decoding per partition. The
    * mapPartitions boundary is where a real codec would allocate its
    * native context once and reuse it across the partition's rows.
    */
  def decode(payloads: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codec: init decoder context here, once per partition
        it.map { case (id, bytes) => decodeFake(id, bytes) }
      }
      .toDF()
  }

  /** Frame-sampling: one output row per sampled frame index, stride
    * `every` — the explode happens AFTER decode so only metadata (not
    * pixels) shuffles.
    */
  def sampleFrames(meta: DataFrame, every: Int = 2): DataFrame =
    meta.withColumn("frame_idx",
      explode(sequence(lit(0), col("frames") - 1, lit(every))))
}
