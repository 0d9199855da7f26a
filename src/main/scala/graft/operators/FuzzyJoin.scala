package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity join via DELETION-NEIGHBORHOOD
  * blocking (the FastSS / SymSpell family): two strings are within
  * Levenshtein distance k only if deleting at most k characters from
  * each yields a COMMON variant, so the candidate set is the self-join
  * on deletion variants — O(n · len^k) candidate rows instead of the
  * O(n²) all-pairs cross join — and every candidate is then verified
  * with the exact (codegen'd, built-in) `levenshtein`. Recall is 1 by
  * the FastSS theorem; the blocking only ever over-generates, and the
  * verify step removes the excess. No UDF anywhere: variants are a
  * `transform(sequence(...))` over substrings, so generation runs
  * inside whole-stage codegen at the scan.
  *
  * Scale shape: one shuffle of the variant table on the variant string
  * (the join key). Variant count per row is `1 + len` for k=1 and
  * O(len²) for k=2, so `maxLen` REFUSES over-long strings outright
  * rather than silently truncating (a truncated candidate stage loses
  * recall): at 100 TB this operator runs on keys, titles and names —
  * near-dup DOCUMENTS are MinHash/SimHash's job ([[Dedup]]).
  */
object FuzzyJoin {

  /** All strings obtainable from `s` by deleting exactly one
    * character, as a codegen'd array expression.
    */
  private def deletions(s: Column): Column =
    transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1),
        s.substr(i + 1, length(s))))

  /** Pairs `(id_a, s_a, id_b, s_b, dist)` with
    * `levenshtein(s_a, s_b) <= maxDist` and `id_a < id_b`.
    *
    * @param maxDist 1 or 2
    * @param maxLen  refuse strings longer than this (variant count and
    *                verify cost are the caller's contract)
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxLen: Int = 256): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion-neighborhood blocking supports maxDist 1 or 2, got $maxDist")
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .where(col("s").isNotNull)
    val tooLong = base.where(length(col("s")) > maxLen).limit(1).count()
    require(tooLong == 0,
      s"editDistancePairs: a value exceeds maxLen=$maxLen — raise maxLen " +
        "or pre-truncate explicitly (silent truncation would lose recall)")
    val d1 = array_union(array(col("s")), deletions(col("s")))
    val varCol =
      if (maxDist == 1) d1
      else array_distinct(flatten(transform(d1, v =>
        array_union(array(v), transform(sequence(lit(1), length(v)),
          i => concat(v.substr(lit(1), i - 1),
            v.substr(i + 1, length(v))))))))
    val v = base.select(col("id"), col("s"), explode(varCol).as("v"))
    val a = v.select(col("id").as("id_a"), col("s").as("s_a"),
      col("v"))
    val b = v.select(col("id").as("id_b"), col("s").as("s_b"),
      col("v"))
    a.join(b, Seq("v"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "s_a", "id_b", "s_b")
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .where(col("dist") <= maxDist)
  }
}
