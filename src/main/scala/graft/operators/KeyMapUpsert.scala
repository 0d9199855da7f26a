package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's signature composite operator: surrogate-key-map upsert
  * (SURVEY §2 J2+J4+W1; reference:
  * jobs/curated/lookups/product_lkp/dl_ct_gosales_product_lkp_01.py:50-80,
  * .../method_hlp_01.py:50-65, .../retailer_hlp_01.py:50-65).
  *
  * Semantics: given a source column of natural keys and the current
  * target key-map (naturalKey → surrogateKey), emit the NEW natural keys
  * numbered max(existing surrogate)+1 ... +N.
  *
  * Reference shape: DISTINCT → LEFT JOIN target + IS NULL filter → CROSS
  * JOIN (SELECT MAX(key)) → `max_key + SUM(1) OVER (ROWS UNBOUNDED
  * PRECEDING)`. That global unpartitioned window collapses to ONE
  * partition (the reference's one real physical hazard — SURVEY §4).
  *
  * Spark-first rebuild:
  *  - anti join instead of left-join+IS NULL (same semantics, no NULL
  *    column materialized);
  *  - the 1-row MAX aggregate is crossJoin'd (BroadcastNestedLoopJoin on
  *    a 1-row side — effectively free);
  *  - numbering is deterministic `row_number() OVER (ORDER BY naturalKey)`.
  *    New-keys-per-batch cardinality is small by construction (it is the
  *    rate of *new* dimension members), so the single-partition sort is
  *    bounded; for bulk backfills `scalable = true` switches to
  *    partition-parallel numbering via per-partition counts + offsets
  *    (zipWithIndex-style, no global sort), at the cost of key order
  *    being tied to partition layout.
  */
object KeyMapUpsert {

  /** @param source     incoming rows
    * @param target     current key map (may be empty on first run)
    * @param naturalKey natural-key column name in `source`
    * @param surrogateKey surrogate-key column name in `target`/output
    * @param normalize  key comparator normalization (default: lower —
    *                   reference compares lower() but stores raw case,
    *                   SURVEY §7.5.4)
    */
  def newKeys(
      source: DataFrame,
      target: DataFrame,
      naturalKey: String,
      surrogateKey: String,
      normalize: Column => Column = lower,
      scalable: Boolean = false): DataFrame = {
    val spark = source.sparkSession

    // Dedupe on the NORMALIZED key within the batch (min natural key as
    // the deterministic representative). The reference dedupes raw keys
    // but matches case-insensitively — so "A" and "a" in one batch would
    // both get surrogate keys and every later lower()-join would
    // double-match; a deliberate fix, per SURVEY §3.2.6's hazard list.
    val distinctNew = source
      .select(col(naturalKey))
      .where(col(naturalKey).isNotNull)
      .groupBy(normalize(col(naturalKey)).as("__nk"))
      .agg(min(col(naturalKey)).as(naturalKey))
      .join(
        target.select(normalize(col(naturalKey)).as("__tk")).distinct(),
        col("__nk") === col("__tk"),
        "left_anti")
      .select(col(naturalKey))

    val maxKey = target
      .agg(coalesce(max(col(surrogateKey)), lit(0L)).as("__max_key"))

    if (scalable) {
      // Partition-parallel numbering: rank partitions by size prefix-sums
      // (tiny driver-side array), then per-partition local index + offset.
      val withId = distinctNew
        .repartition(spark.sparkContext.defaultParallelism, col(naturalKey))
        .withColumn("__mid", monotonically_increasing_id())
      // monotonically_increasing_id is unique but sparse; densify with a
      // row_number per partition + partition offsets computed from counts.
      val w = Window.partitionBy(spark_partition_id()).orderBy(col("__mid"))
      val local = withId
        .withColumn("__pid", spark_partition_id())
        .withColumn("__local", row_number().over(w).cast("long"))
      val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
        .withColumn(
          "__offset",
          coalesce(
            sum(col("__n")).over(
              Window.orderBy(col("__pid"))
                .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .select(col("__pid"), col("__offset"))
      local
        .join(broadcast(offsets), "__pid")
        .crossJoin(broadcast(maxKey))
        .select(
          col(naturalKey),
          (col("__max_key") + col("__offset") + col("__local"))
            .as(surrogateKey))
    } else {
      val w = Window.orderBy(col(naturalKey))
      distinctNew
        .crossJoin(broadcast(maxKey))
        .select(
          col(naturalKey),
          (col("__max_key") + row_number().over(w).cast("long"))
            .as(surrogateKey))
    }
  }

  /** Full upsert: existing map ∪ freshly-numbered new keys. */
  def upsert(
      source: DataFrame,
      target: DataFrame,
      naturalKey: String,
      surrogateKey: String,
      normalize: Column => Column = lower,
      scalable: Boolean = false): DataFrame = {
    val fresh =
      newKeys(source, target, naturalKey, surrogateKey, normalize, scalable)
    target.select(col(naturalKey), col(surrogateKey)).unionByName(fresh)
  }
}
