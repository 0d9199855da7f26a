package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, each designed
  * for the 100 TB regime:
  *
  *  - exact: one hash-shuffle on a fingerprint of the key, min-id wins.
  *  - MinHash+LSH: shingle → minhash signature (map-side, no shuffle) →
  *    band buckets → shuffle only on (band, bucket) → candidate pairs →
  *    exact-Jaccard verification. Pair blow-up is confined to rows that
  *    collide in a band, i.e. likely near-dups.
  *  - SimHash: 64-bit signature, self-join on rotated signature bands.
  *  - n-gram Jaccard: exact, for small/verification workloads.
  */
object Dedup {

  /** Exact dedup on a (possibly normalized) key: keeps the row with the
    * smallest tie-break id per key. Aggregates instead of
    * window-sort — one shuffle, no per-group sort of full rows.
    */
  def exact(df: DataFrame, key: Column, idCol: String): DataFrame = {
    val keyed = df.withColumn("__dk", key)
    val winners = keyed
      .groupBy(col("__dk"))
      .agg(min(col(idCol)).as(idCol))
    keyed
      .join(winners, Seq("__dk", idCol))
      .drop("__dk")
  }

  /** MinHash signature: for each of `numHashes` hash functions, the min
    * over the document's shingle set of xxhash64(seed, shingle).
    * Computed entirely map-side (explode → groupBy doc) — one shuffle on
    * the doc id.
    */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      numHashes: Int): DataFrame = {
    val sh = docs
      .select(col(idCol),
        explode(array_distinct(
          TextFunctions.charShingles(col(textCol), shingleSize)))
          .as("__shingle"))
    val hashAggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("__shingle"))).as(s"h$i"))
    sh.groupBy(col(idCol)).agg(hashAggs.head, hashAggs.tail: _*)
  }

  /** LSH banding: signature of `numHashes` minhashes split into `bands`
    * bands; docs sharing any band bucket become candidate pairs, then
    * exact Jaccard over shingle sets filters to `threshold`.
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 8,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(docs, idCol, textCol, shingleSize, numHashes)

    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), hash(cols: _*).as("bucket"))
    }
    val buckets = sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))

    val a = buckets.as("a")
    val b = buckets.as("b")
    val candidates = a
      .join(b,
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()

    verifyJaccard(docs, candidates, idCol, textCol, shingleSize, threshold)
  }

  /** Exact Jaccard over candidate pairs (the verification stage). */
  def verifyJaccard(
      docs: DataFrame,
      pairs: DataFrame, // columns id_a, id_b
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame = {
    val sets = docs.select(
      col(idCol).as("__id"),
      array_distinct(TextFunctions.charShingles(col(textCol), shingleSize))
        .as("__set"))
    pairs
      .join(sets.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__set", "__sa"), "id_a")
      .join(sets.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__set", "__sb"), "id_b")
      .withColumn("__common", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("jaccard",
        round(col("__common").cast("double") /
          (size(col("__sa")) + size(col("__sb")) - col("__common")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard via shingle-inverted-index join —
    * the shuffle key is the shingle, so only docs SHARING a shingle ever
    * meet. Quadratic only within a shingle's posting list.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame = {
    val sh = docs.select(
      col(idCol).as("__id"),
      explode(array_distinct(
        TextFunctions.charShingles(col(textCol), shingleSize)))
        .as("__shingle"))
    val sizes = sh.groupBy(col("__id")).agg(count(lit(1)).as("__n"))

    val common = sh.as("x")
      .join(sh.as("y"),
        col("x.__shingle") === col("y.__shingle") &&
          col("x.__id") < col("y.__id"))
      .groupBy(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .agg(count(lit(1)).as("__common"))

    common
      .join(sizes.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__n", "__na"), "id_a")
      .join(sizes.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__n", "__nb"), "id_b")
      .withColumn("jaccard",
        round(col("__common").cast("double")
          / (col("__na") + col("__nb") - col("__common")), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash: 64-bit signature where bit i is the sign of the sum of
    * (+1/-1) votes from each token's xxhash64 bit i. Near-dup candidates
    * share a signature prefix band; verified by Hamming distance.
    */
  def simhash(text: Column): Column = {
    val tokens = split(trim(lower(text)), "\\s+")
    val bits = (0 until 64).map { i =>
      val votes = aggregate(
        tokens,
        lit(0),
        (acc, t) =>
          acc + when(
            xxhash64(t).bitwiseAND(shiftleft(lit(1L), i)) =!= 0L, 1)
            .otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    * chunks (any-equal-chunk ⇒ candidate, guaranteeing recall for
    * hamming ≤ 3), verify by full Hamming distance.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val signed = docs.select(col(idCol).as("__id"),
      simhash(col(textCol)).as("__sig"))
    val banded = signed.select(
      col("__id"), col("__sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          (shiftright(col("__sig"), b * 16).bitwiseAND(lit(0xFFFFL)))
            .as("chunk"))): _*)).as("bb"))
      .select(col("__id"), col("__sig"), col("bb.band"), col("bb.chunk"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.__id") < col("b.__id"))
      .select(
        col("a.__id").as("id_a"),
        col("b.__id").as("id_b"),
        graft.functions.VectorFunctions
          .hamming64(col("a.__sig"), col("b.__sig")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
