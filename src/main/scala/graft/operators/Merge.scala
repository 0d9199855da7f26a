package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-1 MERGE upsert — the operator the reference's metadata contract
  * reserves but never implements: every table dict carries a
  * `merge_column` key (reference: commons/dictionary_check.py:11, parsed
  * at commons/utilities.py:194), yet the curated jobs only ever insert
  * (`oper='I'`, jobs/curated/facts/sales_fact/
  * dl_ct_gosales_sales_fact_01.py:65) and [[KeyMapUpsert]] only appends
  * new keys. Any pipeline ingesting a MUTABLE dimension (customer moves
  * segment, product gets renamed) needs MERGE: matched target rows are
  * REPLACED by the incoming row, unmatched incoming rows are inserted,
  * untouched target rows survive.
  *
  * Spark-first shape (no Delta/warehouse MERGE INTO available — this is
  * the engine-level equivalent):
  *
  *  1. collapse `updates` to one row per merge key — newest wins by
  *     `versionCol` DESC with a deterministic tiebreak (so re-running a
  *     batch that carries duplicate keys is reproducible);
  *  2. one FULL OUTER join of target vs collapsed updates on the merge
  *     keys; per row, the update side wins when present (row-level
  *     replacement, NOT per-column coalesce — an update that sets a
  *     column to NULL must stick, so presence is detected via a
  *     non-null marker literal, never via data columns).
  *
  * Scale notes (100 TB): the dedup window partitions by the merge keys
  * and the join keys are the same columns, so the updates side is
  * hash-partitioned ONCE and the exchange is reused across both
  * operators; the target pays the one unavoidable shuffle. A full outer
  * join can never broadcast, but when the target is written bucketed on
  * the merge keys ([[graft.sinks.Bucketing]]) its exchange disappears
  * too — MERGE then costs one shuffle of the (small) delta only, which
  * is the lakehouse-engine shape (Delta/Iceberg do the same dance with
  * file-level pruning on top). Update batches are typically ≪ target, so
  * the window is cheap; the full-outer is the dominant cost and it is
  * one stage.
  */
object Merge {

  /** SCD-1 upsert of `updates` into `target`.
    *
    * @param target     current table state
    * @param updates    incoming rows; must contain every `target` column
    *                   (extra columns — e.g. the version column — are
    *                   dropped from the output, which keeps the target
    *                   schema exactly)
    * @param keyCols    merge keys (the reference's `merge_column`)
    * @param versionCol newest-wins ordering column inside `updates`;
    *                   None ⇒ updates are trusted unique per key and
    *                   duplicates collapse by the tiebreak alone
    * @param tiebreak   deterministic tiebreak columns (ascending) for
    *                   equal versions — defaults to all non-key data
    *                   columns in `target` order so the collapse is
    *                   never layout-dependent
    */
  def upsert(
      target: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: Option[String] = None,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "MERGE needs at least one merge key")
    val outCols = target.columns.toSeq
    val dataCols = outCols.filterNot(keyCols.contains)
    val tb = if (tiebreak.nonEmpty) tiebreak else dataCols
    val ordering =
      versionCol.map(col(_).desc).toSeq ++ tb.map(col(_).asc)
    // NULL-merge-key updates can never match (ANSI MERGE) — they insert
    // as-is, WITHOUT the newest-wins collapse: Window.partitionBy groups
    // all NULL keys into one partition, so leaving them in the window
    // would silently keep only one of them
    val anyKeyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val nullKeyed = updates.where(anyKeyNull).select(outCols.map(col): _*)
    // newest-wins collapse; window partitioning == join keys below, so
    // Catalyst reuses one hash exchange of the updates side for both
    val latest = updates
      .where(!anyKeyNull)
      .withColumn("__rn",
        row_number().over(
          Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)))
      .where(col("__rn") === 1)
      // marker column: row-level presence flag for the post-join
      // selection (data columns can be legitimately NULL, key columns
      // vanish on the unmatched-target side — only a constant works)
      .select(outCols.map(col) :+ lit(true).as("__upd"): _*)

    // plain equality, deliberately NOT null-safe `<=>`: (a) ANSI MERGE
    // semantics — a NULL merge key never matches, the row just lands as
    // its own unmatched side; (b) `<=>` makes the join partition on
    // (coalesce(k), isnull(k)) which no longer matches the window's
    // hashpartitioning(k) — the updates side would shuffle TWICE
    // (plan-asserted in MergeSpec). Sides are aliased because target and
    // updates routinely share lineage (updates derived from the same
    // source table), which otherwise trips the ambiguous-self-join check.
    val t = target.alias("__mt")
    val u = latest.alias("__mu")
    val joinCond = keyCols
      .map(k => col(s"__mt.$k") === col(s"__mu.$k"))
      .reduce(_ && _)
    // selected in outCols ORDER (not keys-then-data): the output must
    // keep the target's column order exactly, or positional consumers
    // (insertInto, CSV) misalign when merge keys aren't leading
    t.join(u, joinCond, "full_outer").select(
      outCols.map { c =>
        if (keyCols.contains(c))
          coalesce(col(s"__mu.$c"), col(s"__mt.$c")).as(c)
        else
          when(col("__mu.__upd").isNotNull, col(s"__mu.$c"))
            .otherwise(col(s"__mt.$c")).as(c)
      }: _*)
      .unionByName(nullKeyed)
  }

  /** Metadata-driven variant: merge keys come from the declared schema
    * (`ColumnDef.isMergeKey` — the `merge_column` contract,
    * commons/dictionary_check.py:11).
    */
  def upsertFor(
      target: DataFrame,
      updates: DataFrame,
      tdef: graft.meta.TableDef,
      versionCol: Option[String] = None): DataFrame =
    upsert(target, updates, tdef.mergeKeys, versionCol)
}
