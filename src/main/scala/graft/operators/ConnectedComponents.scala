package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — turns near-dup PAIRS (from
  * MinHash/SimHash/Jaccard joins) into dup CLUSTERS so a dedup pipeline
  * can keep one canonical document per cluster.
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING.
  * Each node starts labeled with itself; every round each node takes
  * the min label in its neighborhood, then replaces that label with
  * the label's own label (valid: a node's label is always a member of
  * its component with a ≤ label, so the jump can only move toward the
  * minimum). The jump halves the effective distance to the component
  * minimum each round — chains/paths converge in O(log diameter)
  * rounds instead of O(diameter). Each round is the neighborhood
  * join+agg plus a self-join of the (tiny: one row per node) label
  * table — no driver-side graph, so it scales to billions of edges.
  * Near-dup graphs are unions of small cliques (diameter ≤ 2-3, 2-3
  * rounds); `maxIter` 50 is a pure backstop — with jumping it admits
  * graphs of diameter ~2^50, and the loop always exits early via an
  * AGGREGATE convergence check (label checksum), never a per-round
  * collect of labels.
  */
object ConnectedComponents {

  /** @param pairs  undirected edges: columns (id_a, id_b)
    * @param maxIter iteration budget — must be ≥ rounds-to-converge + 1
    *   (convergence is detected by two consecutive equal label
    *   checksums, so even an already-stable labeling needs one extra
    *   confirming round). With pointer jumping rounds ≈ log2(diameter)
    *   + 2, so the default 50 admits graphs of diameter ~2^48.
    * @return (id, component) — component = min node id reachable
    * @throws IllegalStateException if the budget is exhausted before
    *   convergence — partial labels are WRONG components, and a
    *   correctness-critical operator must fail loud rather than return
    *   them silently.
    */
  def components(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
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
    val labels0 = labels

    // convergence via a label-sum checksum: labels are monotonically
    // non-increasing per node, so the total sum strictly decreases iff
    // any label changed — one aggregate job per round, no join probe.
    var converged = false
    var prevSum = Long.MinValue
    var i = 0
    // ids of the previous round's pinned RDD blocks, freed
    // deterministically once the next round has materialized —
    // localCheckpoint blocks are plain persisted RDDs invisible to
    // DataFrame.unpersist, so without this only a later GC (via the
    // ContextCleaner) would reclaim them, and a deep run would hold
    // every round's label table in storage simultaneously
    var prevRoundIds: Set[Int] = Set.empty
    val sc = spark.sparkContext
    while (!converged && i < maxIter) {
      val prop = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("label")).as("label2"))
        .cache()
      // pointer jump: label := label's label. Every label is a node id
      // of the same component (so present in `prop`), but the left
      // join + coalesce keeps this robust rather than row-dropping if
      // that invariant is ever disturbed. PINNED, not cached: the
      // self-join references `prop` twice, so an un-truncated plan
      // would DOUBLE in size every round — exponential in rounds, an
      // OOM in plan stringification alone by round ~10. The per-round
      // pin materializes a one-row-per-node table and restarts the
      // lineage, keeping every round's plan O(1). pinLocal, not pin:
      // round tables are transient (superseded next round), so a
      // reliable checkpoint per round would only leak files.
      val beforeIds = sc.getPersistentRDDs.keySet.toSet
      val next = Par.pinLocal(prop.as("x")
        .join(prop.as("y").select(col("id2").as("__jid"),
          col("label2").as("__jlabel")),
          col("x.label2") === col("__jid"), "left")
        .select(col("x.id2").as("id2"),
          coalesce(col("__jlabel"), col("x.label2")).as("label2")))
      val sumNow = next.agg(coalesce(sum(col("label2")), lit(0L)))
        .head().getLong(0)
      prop.unpersist()
      // this round is materialized — free the previous round's blocks
      prevRoundIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevRoundIds = sc.getPersistentRDDs.keySet.toSet -- beforeIds
      labels = next.select(col("id2").as("id"), col("label2").as("label"))
      converged = sumNow == prevSum
      prevSum = sumNow
      i += 1
    }
    if (!converged) {
      // free what we hold before failing — the caller gets an exception,
      // not a frame, so nothing downstream will release these
      prevRoundIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      labels0.unpersist()
      edges.unpersist()
      p.unpersist()
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within maxIter=$maxIter " +
          "rounds — partial labels would be wrong components. Raise " +
          "maxIter (rounds needed ≈ log2(graph diameter) + 2).")
    }
    // labels is already a projection over a pinned round table (or the
    // initial cache when the edge set is empty) — pin the renamed
    // output so the returned frame survives the cache releases below
    val out = Par.pin(labels.withColumnRenamed("label", "component"))
    // out is pinned — the final round's blocks can go too
    prevRoundIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    labels0.unpersist()
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
