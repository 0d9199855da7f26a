package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — turns near-dup PAIRS (from
  * MinHash/SimHash/Jaccard joins) into dup CLUSTERS so a dedup pipeline
  * can keep one canonical document per cluster.
  *
  * Algorithm: iterative min-label propagation. Each node starts labeled
  * with itself; every round each node takes the min label in its
  * neighborhood (including itself); converges in O(diameter) rounds.
  * Each round is two shuffles (join + agg) — no driver-side graph, so
  * it scales to billions of edges. Near-dup graphs are unions of small
  * cliques (diameter ≤ 2-3), so `maxIter` default 10 is generous; the
  * loop exits early via an AGGREGATE convergence check, not a per-round
  * collect of labels.
  */
object ConnectedComponents {

  /** @param pairs  undirected edges: columns (id_a, id_b)
    * @return (id, component) — component = min node id reachable
    */
  def components(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val spark = pairs.sparkSession
    // materialize the (possibly expensive) pair pipeline ONCE and CUT
    // LINEAGE — the 4-way symmetrizing union below references it 4×,
    // and a plain cache() can be recomputed from scratch under memory
    // pressure (observed: a 10 s pair pipeline ballooning a bench run
    // to 190+ s when evicted mid-iteration). Par.pin uses a RELIABLE
    // checkpoint when the app has a checkpoint dir (cluster-safe:
    // localCheckpoint blocks die with their executor), else
    // localCheckpoint for local runs.
    val p = Par.pin(pairs.select(col("id_a"), col("id_b")))
    // symmetrize once; self-edges make "keep own label" part of the agg
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .union(p.select(col("id_a").as("src"), col("id_a").as("dst")))
      .union(p.select(col("id_b").as("src"), col("id_b").as("dst")))
      .distinct()
      .cache()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
    // exactly one cached label table is live at any time: materialize
    // the new round, then release the previous round's cache
    var prevCached = labels

    // convergence via a label-sum checksum: labels are monotonically
    // non-increasing per node, so the total sum strictly decreases iff
    // any label changed — one aggregate job per round, no join probe.
    var converged = false
    var prevSum = Long.MinValue
    var i = 0
    while (!converged && i < maxIter) {
      val next = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("label")).as("label2"))
        .cache()
      val sumNow = next.agg(coalesce(sum(col("label2")), lit(0L)))
        .head().getLong(0) // materializes next's cache
      prevCached.unpersist()
      prevCached = next
      // plain projection over the cached `next` — no second cache
      labels = next.select(col("id2").as("id"), col("label2").as("label"))
      converged = sumNow == prevSum
      prevSum = sumNow
      i += 1
    }
    // pin the result before releasing the caches it derives from — the
    // returned frame must not re-trigger the iteration lineage
    val out = Par.pin(labels.withColumnRenamed("label", "component"))
    prevCached.unpersist()
    edges.unpersist()
    p.unpersist()
    out
  }

  /** Dedup driver: given docs and near-dup pairs, keep one canonical row
    * (min id) per duplicate cluster; rows in no pair survive untouched.
    */
  def canonicalize(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    // unique internal names: docs may itself have "id"/"component"
    // columns (drop("id") would otherwise delete the caller's column)
    val comp = components(pairs)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    docs.join(comp, docs(idCol) === col("__cc_id"), "left")
      .where(col("__cc_comp").isNull || col("__cc_comp") === docs(idCol))
      .drop("__cc_id", "__cc_comp")
  }
}
