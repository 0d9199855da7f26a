package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.FingerprintExpr

/** Deterministic stratified sampling — the corpus-rebalancing step of a
  * training-data pipeline (downsample the dominant language/source,
  * keep the rare strata whole).
  *
  * No RNG: a row is kept iff `fingerprint(content) % 1000 <
  * rate‰(stratum)`. Content-addressing is the scale property: re-runs,
  * re-partitioning, cluster size, speculative re-execution — nothing
  * can move a document in or out of the sample, so the sample is
  * reproducible and byte-identical duplicates sample identically
  * (consistent with the fingerprint bucketing `dataset_split` uses —
  * a near-dup pipeline downstream sees a self-consistent corpus).
  * Pure scan-stage predicate: no shuffle, no state, pushes through
  * column pruning like any filter.
  */
object Sample {

  /** @param ratesPermille per-stratum keep rate in ‰ (0..1000)
    * @param defaultPermille keep rate for strata not listed
    */
  def stratifiedPermille(
      df: DataFrame,
      stratum: Column,
      content: Column,
      ratesPermille: Map[String, Int],
      defaultPermille: Int): DataFrame = {
    require((ratesPermille.values ++ Seq(defaultPermille))
      .forall(r => r >= 0 && r <= 1000), "rates must be 0..1000 permille")
    val rate = ratesPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (k, v)) => when(stratum === k, lit(v)).otherwise(acc)
    }
    // fingerprint is non-negative by construction (mod 2^31-1), so
    // plain % matches the oracle engine's %. NULL content is addressed
    // as the EMPTY document (coalesce to ''): a NULL fingerprint would
    // make the predicate NULL and silently drop the row even at rate
    // 1000‰ — instead all NULL/empty docs share one fingerprint and
    // move in or out of the sample together, the same "byte-identical
    // duplicates sample identically" contract as the rest of the
    // content-addressed family (dataset_split).
    df.where(
      FingerprintExpr.fingerprint(coalesce(content, lit(""))) % 1000 < rate)
  }
}
