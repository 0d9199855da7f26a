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

  /** TEMPERATURE-FLATTENED corpus mixing — the multi-source sampling
    * rule training-data pipelines use to balance corpora: source i
    * with n_i documents receives target share ∝ n_i^α of
    * `targetTotal` (α = 1 → natural proportions, α = 0 → uniform
    * across sources, the usual α ∈ [0.2, 0.7] flattens dominant
    * sources without drowning rare ones). Shares become per-source
    * permille keep-rates over the content-addressed gate of
    * [[stratifiedPermille]], so the realized sample inherits every
    * determinism property (re-run/replay/partitioning-proof,
    * byte-identical duplicates move together).
    *
    * Scale shape: one partial-agg count per source (sources are few —
    * the rate table is a driver artifact exactly like the BPE vocab),
    * then a scan-stage filter. Zero shuffles of the corpus.
    *
    * Portability note pinned by the `temperature_mix` oracle: α = 0.5
    * routes through `math.sqrt` (IEEE correctly-rounded in every
    * engine), and the share denominator folds source weights in
    * SORTED source order — double addition is order-sensitive, and
    * the oracle's ordered aggregate mirrors the same fold.
    *
    * @return (sampled frame, per-source permille rates)
    */
  def temperatureMix(
      df: DataFrame,
      sourceCol: String,
      content: Column,
      alpha: Double,
      targetTotal: Long): (DataFrame, Map[String, Int]) = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    require(targetTotal > 0, "targetTotal must be positive")
    def weight(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) // exact-portable, see note
      else math.pow(n.toDouble, alpha)
    val counts = df.groupBy(col(sourceCol)).count()
      .collect()
      .flatMap(r => Option(r.get(0)).map(s => s.toString -> r.getLong(1)))
      .sortBy(_._1)
    val denom = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + weight(n) }
    val rates = counts.map { case (s, n) =>
      s -> math.min(1000L,
        math.floor(1000.0 * targetTotal * weight(n) / denom / n.toDouble)
          .toLong).toInt
    }.toMap
    (stratifiedPermille(df, col(sourceCol), content, rates,
      defaultPermille = 0), rates)
  }
}
