package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode runs per-partition and preserves row identity") {
    val docs = Seq((1L, "abcd"), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val meta = Multimodal.decode(docs, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(meta.length == 2)
    val r1 = meta(0)
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 4L)
    assert(r1.getInt(2) == 16 + 4 % 64) // width from byte length
    assert(r1.getInt(3) == 16 + 'a'.toInt % 64) // height from first byte
    val r2 = meta(1)
    assert(r2.getLong(1) == 0L && r2.getInt(3) == 16) // empty payload
  }

  test("frame sampling explodes stride-2 frame indices") {
    val docs = Seq((1L, "abcdefg")).toDF("doc_id", "text") // 7 bytes → 8 frames
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val frames = Multimodal.sampleFrames(
      Multimodal.decode(docs, "doc_id", "payload"), every = 2)
    assert(frames.select("frame_idx").as[Int].collect().toSeq == Seq(0, 2, 4, 6))
  }
}
