package graft

import org.apache.spark.sql.functions._
import graft.operators.KeyMapUpsert

class KeyMapUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target(rows: (String, Long)*) =
    rows.toSeq.toDF("nk", "sk")

  private def source(keys: String*) = keys.toSeq.toDF("nk")

  test("bootstrap: empty target numbers all distinct keys from 1") {
    val out = KeyMapUpsert
      .upsert(source("b", "a", "b", "c"), target(), "nk", "sk")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("upsert keeps existing keys and numbers only new ones above max") {
    val tgt = target("a" -> 7L, "b" -> 3L)
    val out = KeyMapUpsert
      .upsert(source("a", "c", "d", "B"), tgt, "nk", "sk")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "B" matches "b" case-insensitively (reference lower()-normalized
    // comparison, stored case preserved) — only c, d are new.
    assert(out == Map("a" -> 7L, "b" -> 3L, "c" -> 8L, "d" -> 9L))
  }

  test("idempotence: re-running on unchanged input inserts zero rows") {
    val first = KeyMapUpsert.upsert(source("x", "y"), target(), "nk", "sk")
    val second = KeyMapUpsert.newKeys(source("x", "y"), first, "nk", "sk")
    assert(second.count() == 0)
  }

  test("null natural keys never become map entries") {
    val src = Seq(Some("a"), None, Some("b")).toDF("nk")
    val out = KeyMapUpsert.upsert(src, target(), "nk", "sk")
    assert(out.where(col("nk").isNull).count() == 0)
    assert(out.count() == 2)
  }

  test("scalable numbering: same key set, dense unique keys above max") {
    val tgt = target("a" -> 5L)
    val keys = (1 to 300).map(i => f"k$i%03d")
    val out = KeyMapUpsert
      .upsert(source(keys: _*), tgt, "nk", "sk", scalable = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == keys.toSet + "a")
    val fresh = (out - "a").values.toSeq.sorted
    assert(fresh == (6L to 305L)) // dense, unique, strictly above max
  }

  test("deterministic and scalable variants agree on the key SET") {
    val tgt = target("m" -> 2L)
    val src = source("q", "m", "p", "z")
    val det = KeyMapUpsert.upsert(src, tgt, "nk", "sk")
      .select("nk").as[String].collect().toSet
    val sc = KeyMapUpsert.upsert(src, tgt, "nk", "sk", scalable = true)
      .select("nk").as[String].collect().toSet
    assert(det == sc && det == Set("m", "p", "q", "z"))
  }
}
