package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus: one pass over the corpus, no corpus shuffle, then
  * a per-query top-k. This is the exact-recall reference.
  *
  * Scale path: IVF (inverted-file) — assign every corpus vector to its
  * nearest of `nCells` centroids ONCE (linear scan over centroids,
  * map-side), then probe only `nProbe` cells per query. Centroids are
  * taken deterministically from the corpus itself (hash-sampled rows),
  * avoiding an RNG and keeping the index reproducible. At 100 TB the
  * cell assignment is the partition key — queries touch 1/nCells of the
  * data per probe.
  */
object Similarity {

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * Query side must be broadcast-small (the typical ANN-serving shape).
    */
  /** @param excludeSelf drop the corpus row whose id equals the query's
    *   qid — ONLY valid when queries come from the corpus itself; with
    *   an external query table a numeric qid/id coincidence would
    *   silently hide a legitimate neighbor.
    */
  def bruteForceTopK(
      corpus: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val scored = Par.widen(corpus).as("c")
      .crossJoin(broadcast(queries.as("q")))
      .where(if (excludeSelf) !(col("q.qid") <=> col("c.id")) else lit(true))
      .select(
        col("q.qid").as("qid"),
        col("c.id").as("id"),
        round(cosine(col("q.qvec"), col("c.vec")), 6).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF index: deterministic centroids = the `nCells` corpus vectors
    * with smallest xxhash64(id) (a reproducible pseudo-random sample).
    * Returns (id, vec, cell). Requires a numeric `id` column (the
    * argmax tie-break negates the centroid id).
    *
    * Angular assignment: nearest centroid by cosine — the index metric
    * must match the query metric (cosine top-k), not L2.
    *
    * Scale shape: the centroids collapse to ONE row holding an array of
    * (cid, cvec) structs (nCells is broadcast-small by construction),
    * and the per-row nearest-centroid is a pure argmax expression
    * inside the corpus scan stage — no explode, no window, zero corpus
    * shuffle. The previous formulation (crossJoin + row_number window
    * over the exploded corpus×nCells frame) shuffled nCells× the corpus
    * bytes: a scale-killer in the one stage that touches every vector.
    */
  def ivfAssign(
      corpus: DataFrame, // (id, vec)
      nCells: Int): (DataFrame, DataFrame) = {
    val centroids = corpus
      .withColumn("__h", xxhash64(col("id")))
      .orderBy(col("__h"))
      .limit(nCells)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    (ivfAssignTo(corpus, centroids), centroids)
  }

  /** Assign every corpus vector to its nearest centroid from an
    * explicit (cid, cvec) table — the [[ivfAssign]] body, exposed so a
    * caller can supply centroids from a different selection rule (a
    * trained k-means table, or a deterministic slice when the whole
    * index must be replayable by an external oracle engine).
    */
  def ivfAssignTo(
      corpus: DataFrame, // (id, vec)
      centroids: DataFrame): DataFrame = // (cid, cvec)
    ivfAssignScored(corpus, centroids).drop("fit")

  /** [[ivfAssignTo]] keeping the winning cosine as `fit` — the
    * assignment-quality signal [[assignFit]] aggregates for index-drift
    * monitoring. Returns (id, vec, cell, fit).
    */
  def ivfAssignScored(
      corpus: DataFrame, // (id, vec)
      centroids: DataFrame): DataFrame = { // (cid, cvec)
    val centArr = centroids
      .agg(collect_list(struct(col("cid"), col("cvec"))).as("__cents"))
    // argmax via array_max over (cosine, -cid) structs: best cosine
    // first, ties to the SMALLEST cid — the exact ordering the window
    // formulation used (__d desc, cid asc). NaN-safed: a zero vector on
    // either side makes cosine 0/0 = NaN, and Spark totally orders NaN
    // ABOVE every double — an all-zero (degenerate) centroid would win
    // the argmax for EVERY row. nanvl+coalesce pin such scores to -2.0
    // (below any real cosine), so a degenerate cell can never win.
    val scored = transform(col("__cents"), c =>
      struct(
        coalesce(nanvl(cosine(col("vec"), c.getField("cvec")), lit(-2.0)),
          lit(-2.0)).as("d"),
        (-c.getField("cid")).as("ncid")))
    Par.widen(corpus)
      .crossJoin(broadcast(centArr))
      .withColumn("__best", array_max(scored))
      .select(col("id"), col("vec"),
        (-col("__best").getField("ncid")).as("cell"),
        col("__best").getField("d").as("fit"))
  }

  /** Query→cell routing shared by the in-memory and disk-backed probe
    * paths: each query goes to its `nProbe` nearest centroids.
    */
  private def routeProbes(
      queries: DataFrame,
      centroids: DataFrame,
      nProbe: Int): DataFrame = {
    val routed = queries.as("q")
      .crossJoin(broadcast(centroids.as("k")))
      .select(col("q.qid").as("qid"), col("q.qvec").as("qvec"),
        col("k.cid").as("cid"),
        cosine(col("q.qvec"), col("k.cvec")).as("__d"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("__d").desc, col("cid").asc)
    routed
      .withColumn("__r", row_number().over(wq))
      .where(col("__r") <= nProbe)
      .select(col("qid"), col("qvec"), col("cid").as("cell"))
  }

  /** Per-cell scoring + global per-query top-k over joined probe rows. */
  private def scoreTopK(
      joined: DataFrame, k: Int, excludeSelf: Boolean): DataFrame = {
    val scored = joined
      .where(if (excludeSelf) !(col("p.qid") <=> col("c.id")) else lit(true))
      .select(col("p.qid").as("qid"), col("c.id").as("id"),
        round(cosine(col("p.qvec"), col("c.vec")), 6).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF probe: route each query to its `nProbe` nearest centroids and
    * score only vectors in those cells.
    */
  def ivfTopK(
      cells: DataFrame, // (id, vec, cell) from ivfAssign
      centroids: DataFrame, // (cid, cvec)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      nProbe: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val probes = routeProbes(queries, centroids, nProbe)
    // null-safe key on purpose, NOT for nulls (cells are never null):
    // with plain `=`, constraint inference propagates any predicate on
    // the probes' centroid ids (e.g. a deterministic `cid < 16` slice)
    // through the join equality onto `c.cell` — and since `cell` is a
    // projected argmax EXPRESSION, the inferred filter re-derives the
    // whole nearest-centroid scan per row (observed: 3× the argmax work
    // in the corpus scan stage). `<=>` joins identically here but
    // yields no equality constraint to propagate.
    scoreTopK(
      cells.as("c")
        .join(broadcast(probes.as("p")), col("c.cell") <=> col("p.cell")),
      k, excludeSelf)
  }

  /** Persist an IVF index: cells land as one `cell=N/` directory each —
    * the on-disk inverted file. A probe against the read-back index
    * then touches only the probed cells' directories (see
    * [[ivfTopKIndexed]]); at 100 TB that file-listing-level pruning is
    * the difference between an index and a full-corpus scan per query
    * batch.
    */
  def writeIndex(cells: DataFrame, path: String): Unit =
    graft.sinks.ParquetSink(path, partitionBy = Seq("cell")).write(cells)

  /** Incremental index maintenance: assign a DELTA of new vectors
    * against the index's existing centroids and APPEND them into the
    * `cell=N/` layout — no touch of the resident data. Sound because
    * assignment is per-row against fixed centroids: assign(base) ∪
    * assign(delta) ≡ assign(base ∪ delta) (spec-pinned in
    * `SimilaritySpec`), so the grown index answers probes exactly as a
    * full rebuild would. At 100 TB this is the difference between a
    * per-batch index update costing O(|delta|) and one costing
    * O(|corpus|).
    *
    * What appends CANNOT fix is centroid QUALITY: as the data
    * distribution drifts away from the training corpus, cells get
    * lopsided and recall-per-nProbe decays even though correctness of
    * the bucketing is unaffected. Monitor with [[assignFit]] and
    * retrain ([[kmeansCentroids]] + [[writeIndex]] rebuild) when the
    * delta's fit drops materially below the training-time fit.
    */
  def appendIndex(
      delta: DataFrame, // (id, vec)
      centroids: DataFrame, // (cid, cvec) — the index's training output
      path: String): Unit =
    graft.sinks.ParquetSink(path, mode = "append", partitionBy = Seq("cell"))
      .write(ivfAssignTo(delta, centroids))

  /** Scalar int8 quantization of an embedding column: each vector is
    * L2-normalized (exact left-to-right double fold, like every norm
    * here) and each element mapped to `floor(x/||v|| * 127)` ∈
    * [-127, 127]. 4× smaller than float32 — at 100 TB that is the
    * difference between an index that fits executor memory and one
    * that spills — and, crucially for this engine's oracle discipline,
    * scoring becomes EXACT INTEGER arithmetic: no float summation
    * order, no NaN totality traps, ties broken by id. Zero vectors
    * quantize to all-zero (try_divide), scoring 0 against everything.
    *
    * Returns (id, qvec: Array[Int]). The fidelity loss is bounded by
    * the quantization step (1/127 per dim); [[quantizedTopK]]'s recall
    * against the exact path is spec-pinned in `SimilaritySpec`.
    */
  def quantizeUnit(corpus: DataFrame): DataFrame = { // (id, vec)
    val n = norm(col("vec"))
    Par.widen(corpus)
      .select(col("id"), col("vec"), n.as("__n"))
      .select(col("id"),
        transform(col("vec"), x =>
          coalesce(
            floor(try_divide(x.cast("double"), col("__n")) * lit(127.0)),
            lit(0L)).cast("int")).as("qvec"))
  }

  /** Top-k by integer dot product over [[quantizeUnit]] vectors —
    * since both sides are unit-normalized before quantization, the
    * integer dot is a (scaled, discretized) cosine. Same broadcast
    * shape as [[bruteForceTopK]]: the corpus never shuffles. The score
    * is exact integer math, so the ranking is bit-deterministic on any
    * partitioning and externally replayable.
    */
  def quantizedTopK(
      qcorpus: DataFrame, // (id, qvec) from quantizeUnit
      qqueries: DataFrame, // (qid, qvec) from quantizeUnit
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val scored = Par.widen(qcorpus).as("c")
      .crossJoin(broadcast(
        qqueries.select(col("id").as("qid"), col("qvec").as("q2")).as("q")))
      .where(if (excludeSelf) !(col("q.qid") <=> col("c.id")) else lit(true))
      .select(col("q.qid").as("qid"), col("c.id").as("id"),
        aggregate(
          zip_with(col("q.q2"), col("c.qvec"),
            (a, b) => (a * b).cast("long")),
          lit(0L), (acc, v) => acc + v).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Assignment-fit summary of a vector set against `centroids`: one
    * row (n, fit_sum_u) where fit_sum_u is the SUM of per-row winning
    * cosines in exact 1e-6 micro-units — order-independent integer
    * addition, so the number is byte-identical on any partitioning and
    * replayable by an external oracle engine (same trick as
    * [[kmeansCentroids]]). Mean fit = fit_sum_u / 1e6 / n; compare the
    * incoming delta's mean against the training corpus's to decide
    * when the index needs retraining.
    */
  def assignFit(
      vs: DataFrame, // (id, vec)
      centroids: DataFrame): DataFrame =
    ivfAssignScored(vs, centroids)
      .agg(count(lit(1)).as("n"),
        sum(floor(col("fit") * lit(1e6)).cast("long")).as("fit_sum_u"))

  /** IVF probe against a cell-partitioned on-disk index
    * ([[writeIndex]]). Same semantics as [[ivfTopK]]; the join uses
    * plain equality — safe here because the stored `cell` is a real
    * partition column, not a projected argmax expression (no
    * constraint-inference hazard) — which is what lets Spark inject
    * DYNAMIC PARTITION PRUNING: the broadcast probe side's cell set
    * becomes a runtime partition filter on the index scan, so only the
    * probed `cell=N/` directories are listed and read.
    */
  def ivfTopKIndexed(
      indexedCells: DataFrame, // spark.read.parquet(<writeIndex path>)
      centroids: DataFrame, // (cid, cvec)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      nProbe: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val probes = routeProbes(queries, centroids, nProbe)
    scoreTopK(
      indexedCells.as("c")
        .join(broadcast(probes.as("p")), col("c.cell") === col("p.cell")),
      k, excludeSelf)
  }

  /** Deterministic k-means (Lloyd's) trainer for IVF centroids —
    * [[ivfAssign]]'s hash-sampled centroids are a zero-cost index, but a
    * few Lloyd iterations align cells with the corpus's actual cluster
    * structure (higher recall at the same nProbe). DataFrame ops only:
    * per iteration, one corpus scan (argmax assignment against the
    * broadcast centroid array, via [[ivfAssignTo]]) plus one
    * partial-aggregated shuffle of k×dim running sums — the canonical
    * map-side-combine shape, no driver-side collect anywhere.
    *
    * Determinism at cluster scale: float summation order varies with
    * partitioning, so a naive mean-vector update is NOT reproducible
    * across runs/cluster sizes. Instead each element travels as
    * `floor(x*1e6)` integer micro-units and the "centroid" is the EXACT
    * per-cell integer SUM vector — cosine is scale-invariant, so the
    * unnormalized sum assigns identically to the mean while being
    * byte-reproducible on any partitioning (and replayable by an
    * external oracle engine). Empty cells keep their previous centroid.
    * Ties (equal cosine) assign to the smallest cid, as in
    * [[ivfAssignTo]].
    *
    * @param init (cid, cvec) starting centroids — e.g. the hash-sampled
    *             [[ivfAssign]] pick, or a deterministic slice when the
    *             run must be replayable externally
    */
  def kmeansCentroids(
      corpus: DataFrame, // (id, vec)
      dim: Int,
      init: DataFrame, // (cid, cvec)
      iters: Int): DataFrame = {
    def micro(vec: org.apache.spark.sql.Column, d: Int) =
      floor(element_at(vec, d + 1).cast("double") * lit(1e6)).cast("long")
    var cents = Par.pinLocal(init.select(col("cid"), col("cvec")))
    for (_ <- 1 to iters) {
      val assigned = ivfAssignTo(corpus, cents)
      val sumExprs = (0 until dim).map(d =>
        sum(micro(col("vec"), d)).as(s"__s$d"))
      val sums = assigned.groupBy(col("cell"))
        .agg(sumExprs.head, sumExprs.tail: _*)
      val fresh = sums.select(col("cell").as("cid"),
        array((0 until dim).map(d => col(s"__s$d").cast("double")): _*)
          .as("cvec"))
      // per-round pin: the loop's self-reference doubles the plan per
      // iteration otherwise (the pointer-jumping CC lesson); k rows.
      // A cell whose micro-unit sums cancel to the all-zero vector is
      // degenerate (cosine 0/0 = NaN against every row) — retain the
      // previous centroid for it, exactly like an empty cell.
      cents = Par.pinLocal(cents.as("o")
        .join(fresh.as("n"), col("o.cid") === col("n.cid"), "left")
        .select(col("o.cid").as("cid"),
          coalesce(
            when(exists(col("n.cvec"), v => v =!= lit(0.0)), col("n.cvec")),
            col("o.cvec")).as("cvec")))
    }
    cents
  }

  /** EXACT embedding near-duplicate pairs: every (id_a < id_b) pair
    * with cosine ≥ threshold. Inherently quadratic — this is the
    * verification/recall baseline (and the right tool for a bounded
    * slice, e.g. one shard or one cluster of a blocked pipeline), NOT
    * the 100 TB path: for the full corpus use [[cosineNearDupPairs]]
    * (hyperplane-LSH bucketed, near-linear). When one side fits the
    * broadcast threshold the non-equi self-join runs as a
    * BroadcastNestedLoopJoin — the corpus side streams, nothing
    * shuffles.
    */
  def cosinePairsExact(
      corpus: DataFrame, // (id, vec)
      threshold: Double): DataFrame = {
    val a = Par.widen(corpus).as("a")
    val b = corpus.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.vec"), col("b.vec")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold,
    * bucketed by hyperplane-LSH signature so only same-bucket vectors
    * pair up (plus multi-probe via `bands` rotations for recall).
    *
    * Exactly-once emission: a pair whose signatures agree on k of the
    * `bands` chunks collides in k buckets. Instead of computing the
    * cosine k times and collapsing with a distinct shuffle over the
    * candidate set, each pair is emitted only from the FIRST band where
    * its chunks agree — both join sides carry the full signature, so
    * "no earlier band matched" is a pure predicate inside the join (the
    * same canonical-cell trick as RangeJoin.intervalOverlap). One
    * cosine per pair, zero post-join Aggregate.
    */
  /** Persistable hyperplane SIGNATURE INDEX: one (id, sig) row per
    * vector — 8 bytes of signature per embedding, the artifact that
    * makes cosine near-dup detection incremental
    * ([[cosineNearDupIncremental]]), mirroring the text side's
    * minhash index ([[Dedup.minhashIndex]]): a daily batch probes the
    * index instead of re-hashing the corpus, and appends its own rows
    * after ([[appendIndex]]-style).
    */
  def hyperplaneIndex(
      corpus: DataFrame, // (id, vec)
      dim: Int,
      bits: Int = 16): DataFrame =
    Par.widen(corpus).select(col("id"),
      hyperplaneSignature(col("vec"), dim, bits).as("sig"))

  /** Cosine near-dup pairs INVOLVING A NEW BATCH, against a corpus
    * known only through its [[hyperplaneIndex]]: exactly
    * [[cosineNearDupPairs]] over corpus ∪ batch restricted to pairs
    * with at least one side in the batch (property-pinned in
    * `SimilaritySpec`). Cost shape mirrors the text twin: hash the
    * BATCH only; band-join its chunks against index ∪ batch (8-byte
    * index rows, never vectors); fetch VECTORS only for candidate
    * members via a semi-join — the corpus embedding column is read
    * for colliding ids, not scanned.
    *
    * Pair multiplicity differs from the one-shot operator: the
    * asymmetric probe emits batch-internal pairs in both orders and
    * the canonical-band trick only dedups across BANDS, so pairs
    * normalize via least/greatest + distinct before the single
    * cosine per pair.
    */
  def cosineNearDupIncremental(
      corpusVecs: DataFrame, // (id, vec)
      index: DataFrame, // (id, sig) from hyperplaneIndex, same dim/bits
      batch: DataFrame, // (id, vec)
      dim: Int,
      threshold: Double,
      bits: Int = 16,
      bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val perBand = bits / bands
    def chunk(sig: org.apache.spark.sql.Column, b: Int) =
      shiftright(sig, b * perBand).bitwiseAND(lit((1L << perBand) - 1))
    // pinned: probes the band join AND unions into its build side
    val newSigs = Par.pin(Par.widen(batch).select(col("id"),
      hyperplaneSignature(col("vec"), dim, bits).as("sig")))
    val allSigs = index.select(col("id"), col("sig")).unionByName(newSigs)
    def banded(df: DataFrame) = df.select(col("id"), col("sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), chunk(col("sig"), b).as("chunk"))): _*))
        .as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.chunk"))
    val earlierShared = (0 until bands - 1)
      .map(j => (col("a.band") > j) &&
        (chunk(col("a.sig"), j) === chunk(col("b.sig"), j)))
      .foldLeft(lit(false))(_ || _)
    val candidates = Par.pin(banded(newSigs).as("a")
      .join(banded(allSigs).as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.id") =!= col("b.id") &&
          !earlierShared)
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct())
    val ids = candidates.select(col("id_a").as("__cid"))
      .union(candidates.select(col("id_b").as("__cid"))).distinct()
    val pool = corpusVecs.select(col("id"), col("vec"))
      .unionByName(batch.select(col("id"), col("vec")))
    val vecs = Par.pin(
      pool.join(ids, pool("id") === ids("__cid"), "left_semi"))
    candidates
      .join(vecs.select(col("id").as("id_a"), col("vec").as("__va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("__vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(cosine(col("__va"), col("__vb")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  def cosineNearDupPairs(
      corpus: DataFrame, // (id, vec)
      dim: Int,
      threshold: Double,
      bits: Int = 16,
      bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val perBand = bits / bands
    def chunk(sig: org.apache.spark.sql.Column, b: Int) =
      shiftright(sig, b * perBand).bitwiseAND(lit((1L << perBand) - 1))
    // pinned BEFORE the bands explode: the self-join below consumes the
    // frame twice, and pinning here materializes each vector once —
    // pinning after the explode would store every 64-float vector
    // `bands`× (the expensive part, hyperplaneSignature, is above this
    // line; the shift/mask explode below is a trivial map to re-run)
    val signed = Par.pin(Par.widen(corpus).select(col("id"), col("vec"),
      hyperplaneSignature(col("vec"), dim, bits).as("__sig")))
    val banded = signed.select(
      col("id"), col("vec"), col("__sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), chunk(col("__sig"), b).as("chunk"))): _*))
        .as("bb"))
      .select(col("id"), col("vec"), col("__sig"),
        col("bb.band"), col("bb.chunk"))
    // true iff some band BELOW the joined one also matches — then this
    // bucket is not the pair's canonical (first) meeting point and the
    // row is dropped before any cosine work (single-band LSH has no
    // earlier band, so the predicate collapses to false)
    val earlierShared = (0 until bands - 1)
      .map(j =>
        (col("a.band") > j) &&
          (chunk(col("a.__sig"), j) === chunk(col("b.__sig"), j)))
      .foldLeft(lit(false))(_ || _)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id") &&
          !earlierShared)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.vec"), col("b.vec")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
