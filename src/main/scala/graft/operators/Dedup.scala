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
    *
    * Contract: `idCol` is the tie-breaker and should be unique per row;
    * rows TYING on (key, min id) are ALL kept (deterministic — no
    * arbitrary pick). For byte-identical replayed rows, apply
    * `df.distinct()` before/after: collapsing ties here would pick an
    * arbitrary survivor among non-identical rows.
    */
  def exact(df: DataFrame, key: Column, idCol: String): DataFrame = {
    val keyed = df.withColumn("__dk", key)
    val winners = keyed
      .groupBy(col("__dk"))
      .agg(min(col(idCol)).as("__wid"))
    // null-safe equality: a NULL dedup key still forms a group and must
    // keep its representative, not silently vanish in the join
    keyed
      .join(winners,
        keyed("__dk") <=> winners("__dk") &&
          keyed(idCol) <=> winners("__wid"))
      .drop(winners("__dk"))
      .drop("__dk", "__wid")
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
      numHashes: Int): DataFrame =
    minhashSignaturesOf(Par.widen(docs), idCol, textCol, shingleSize, numHashes)

  /** As [[minhashSignatures]] but over an already-widened frame — so a
    * composite operator widens its input exactly once.
    */
  private def minhashSignaturesOf(
      wide: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      numHashes: Int): DataFrame = {
    // MAP-SIDE signatures via ONE codegen'd expression
    // (graft.functions.MinHashSigsExpr): the per-hash minima fold over
    // the row's own shingles in a generated loop instead of exploding
    // to (id, shingleHash) rows and shuffling them into numHashes MIN
    // aggregates — bit-identical (spec-pinned; the expression runs the
    // same xxhash64 chains, hash-level dedup and drop-empty-docs rule
    // as the aggregate pipeline it replaced, and a null signature
    // marks exactly the docs that had no rows to aggregate). The
    // signature stage now runs inside the document scan: zero shuffle.
    // (A higher-order-function formulation — nested transform +
    // array_min — was tried first and measured SLOWER than the
    // shuffle: HigherOrderFunction lambdas are CodegenFallback.)
    wide.select(col(idCol),
        graft.functions.MinHashSigsExpr.minhashOfText(
          col(textCol), shingleSize, numHashes).as("__sig"))
      .where(col("__sig").isNotNull)
      .select(col(idCol) +:
        (0 until numHashes).map(i =>
          element_at(col("__sig"), i + 1).as(s"h$i")): _*)
  }

  /** The (id, band, bucket) rows of a signature set — the shape shared
    * by the one-shot self-join ([[minhashLshPairs]]) and the PERSISTED
    * index ([[minhashIndex]] / [[minhashIncrementalPairs]]).
    */
  private def bucketsOf(
      sigs: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), hash(cols: _*).as("bucket"))
    }
    sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
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
    // widen ONCE; signatures and verification share the widened frame
    // (widening each subtree independently would round-robin-shuffle
    // the corpus twice)
    val wide = Par.widen(docs)
    val sigs = minhashSignaturesOf(wide, idCol, textCol, shingleSize, numHashes)

    // pinned: the self-join references `buckets` twice — without
    // materialization the shingle→minhash pipeline executes twice
    val buckets = Par.pin(bucketsOf(sigs, idCol, numHashes, bands))

    val a = buckets.as("a")
    val b = buckets.as("b")
    val candidates = a
      .join(b,
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()

    verifyJaccardOf(wide, candidates, idCol, textCol, shingleSize, threshold)
  }

  /** The persistable LSH SIGNATURE INDEX of a corpus: one (id, band,
    * bucket) row per document per band. This is the artifact that turns
    * near-dup detection INCREMENTAL: real pipelines dedup a daily batch
    * against an ever-growing corpus, and re-shingling + re-minhashing
    * 100 TB per day ([[minhashLshPairs]] over corpus ∪ batch) is the
    * cost ceiling this removes — the corpus's text is never touched
    * again; only its index rows (3 longs per doc-band, ~thousands×
    * smaller than the text) participate.
    *
    * Write it bucketed on (band, bucket) ([[graft.sinks.Bucketing]])
    * and the incremental probe join needs no index-side exchange;
    * append each batch's index rows after applying it
    * ([[graft.operators.Similarity]]'s `appendIndex` pattern) and the
    * index stays current for O(batch) work per day.
    */
  def minhashIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 8,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    bucketsOf(
      minhashSignaturesOf(Par.widen(docs), idCol, textCol,
        shingleSize, numHashes),
      idCol, numHashes, bands)
  }

  /** Near-dup pairs INVOLVING A NEW BATCH, against a corpus known only
    * through its [[minhashIndex]]: exactly the pairs
    * [[minhashLshPairs]](corpus ∪ batch) would emit restricted to
    * those with at least one side in the batch (property-pinned in
    * `DedupSpec`) — corpus-internal pairs were already handled when
    * their own batches arrived.
    *
    * Cost shape (100 TB corpus, GB-scale batch): shingle + minhash the
    * BATCH only; join its bands against index ∪ batch-bands (the
    * batch side is the small probe; candidates are confined to
    * colliding buckets, as in the one-shot operator); exact-Jaccard
    * verification touches only candidate docs' text — the corpus
    * contributes text for its candidate members via a semi-join, never
    * a full scan of the corpus text column (the scan reads `textCol`
    * for matched docs only; with the documents table partitioned by
    * doc-id range, partition pruning bounds even that).
    *
    * @param index (idCol, band, bucket) rows from [[minhashIndex]],
    *              built with the SAME shingleSize/numHashes/bands
    */
  def minhashIncrementalPairs(
      corpus: DataFrame,
      index: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 8,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val batchWide = Par.widen(batch)
    // pinned: probes the bucket join AND unions into its build side
    val newBuckets = Par.pin(bucketsOf(
      minhashSignaturesOf(batchWide, idCol, textCol, shingleSize, numHashes),
      idCol, numHashes, bands))
    val all = index.select(col(idCol), col("band"), col("bucket"))
      .unionByName(newBuckets)
    val a = newBuckets.as("a")
    val b = all.as("b")
    // batch-vs-(corpus ∪ batch): cross pairs emit once (a = new side);
    // batch-internal pairs emit twice and collapse via least/greatest
    val candidates = a
      .join(b,
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(
        least(col(s"a.$idCol"), col(s"b.$idCol")).as("id_a"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("id_b"))
      .distinct()
    // verification pool: both sides' text — semi-joined down to
    // candidate members inside verifyJaccard, so the corpus text is
    // only read for docs that actually collided
    val pool = corpus.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    verifyJaccard(pool, candidates, idCol, textCol, shingleSize, threshold)
  }

  /** Exact Jaccard over candidate pairs (the verification stage).
    * Shingles travel as xxhash64 longs: intersection/union counts are
    * identical to string shingles up to 64-bit collisions (~1e-19 per
    * pair), and long arrays shuffle and compare ~8× cheaper.
    */
  def verifyJaccard(
      docs: DataFrame,
      pairs: DataFrame, // columns id_a, id_b
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame =
    verifyJaccardOf(Par.widen(docs), pairs, idCol, textCol, shingleSize, threshold)

  private def verifyJaccardOf(
      wide: DataFrame,
      pairs: DataFrame, // columns id_a, id_b
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame = {
    // pin the (often expensive) candidate pipeline: it feeds the id
    // semi-join below AND the two set joins
    val p = Par.pin(pairs.select(col("id_a"), col("id_b")))
    // only docs that appear in a candidate pair need shingling — at
    // scale candidates << corpus, so the verify stage must not re-scan
    // and re-shingle the full corpus
    val ids = p.select(col("id_a").as("__vid"))
      .union(p.select(col("id_b").as("__vid")))
      .distinct()
    // pinned: referenced by both the id_a and id_b joins
    val sets = Par.pin(
      wide.join(ids, wide(idCol) === ids("__vid"), "left_semi")
        .select(
          col(idCol).as("__id"),
          array_distinct(transform(
            TextFunctions.charShingles(col(textCol), shingleSize),
            s => xxhash64(s))).as("__set")))
    p
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

  /** Exact all-pairs n-gram Jaccard ≥ threshold via **prefix filtering**
    * (PPJoin-style): with shingles globally ordered rarest-first, any
    * pair with J ≥ t must share one of each doc's first
    * ⌊(1-t)·n⌋+1 shingles — so only those *prefix* shingles are indexed
    * and joined. Exact (zero recall loss), but posting lists shrink from
    * "every doc containing a common shingle" to "docs whose rare prefix
    * collides": a naive inverted-index self-join on this corpus-shaped
    * data is quadratic (common shingles from a small vocab), while the
    * prefix index stays near-linear. A size-ratio filter
    * (min/max ≥ t ⇒ necessary for J ≥ t) prunes further before the
    * exact verification pass.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame = {
    val wide = Par.widen(docs)
    // set size rides along from the array (no count-over-partition pass).
    // NOT pinned although both the frequency aggregate and the ranked
    // join consume it: shingling is a cheap pipelined map stage, and
    // materializing the exploded frame costs ~6× the recompute it saves
    // (measured 2.0 s pin vs ~0.3 s per extra shingle pass at sf0.1) —
    // the same trade holds at scale, where spilling an exploded corpus
    // is far more expensive than a second pass of the scan+map stage.
    val sh = wide
      .select(col(idCol).as("__id"),
        array_distinct(transform(
          TextFunctions.charShingles(col(textCol), shingleSize),
          s => xxhash64(s))).as("__set"))
      .select(col("__id"), size(col("__set")).as("__n"),
        explode(col("__set")).as("__shingle"))

    // global rarest-first total order on shingles (freq, shingle);
    // freq output is tiny after aggregation → AQE broadcasts the join
    val freq = sh.groupBy(col("__shingle")).agg(count(lit(1)).as("__f"))

    val wDoc = Window.partitionBy(col("__id"))
      .orderBy(col("__f").asc, col("__shingle").asc)
    val ranked = sh.join(freq, "__shingle")
      .withColumn("__r", row_number().over(wDoc))

    // index only the prefix: r ≤ n - ceil(t*n) + 1
    // pinned: the candidate self-join references `prefix` twice
    val prefix = Par.pin(ranked
      .where(col("__r") <=
        col("__n") - ceil(col("__n") * threshold) + 1)
      .select(col("__id"), col("__shingle"), col("__n")))

    val candidates = prefix.as("x")
      .join(prefix.as("y"),
        col("x.__shingle") === col("y.__shingle") &&
          col("x.__id") < col("y.__id") &&
          // size-ratio filter: J ≤ min/max, so min/max ≥ t is necessary
          least(col("x.__n"), col("y.__n")) >=
            ceil(greatest(col("x.__n"), col("y.__n")) * threshold))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
      .distinct()

    verifyJaccardOf(wide, candidates, idCol, textCol, shingleSize, threshold)
  }

  /** SimHash: 64-bit signature where bit i is the sign of the sum of
    * (+1/-1) votes from each token's xxhash64 bit i.
    *
    * Shape: explode tokens → hash once → 64 codegen'd SUM aggregates
    * with map-side partials → fold votes into the signature. One shuffle
    * on the doc id; each token is split and hashed exactly once (the
    * naive per-bit formulation re-tokenizes and re-hashes the text 64×
    * in interpreted higher-order functions — ~10× slower measured).
    */
  def simhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    // one codegen'd expression per row (graft.functions.SimHash64Expr)
    // — bit-identical to the original explode → shuffle → 64-SUM
    // pipeline (equality spec-pinned in TextFunctionsSpec), but the
    // signature stage is now a PROJECTION in the doc scan: zero
    // explode, zero shuffle. Assumes ids unique per row (the Dedup
    // contract); duplicate ids would now sign per ROW, not per id.
    Par.widen(docs).select(col(idCol).as("__id"),
      graft.functions.SimHash64Expr.simhash64(
        split(trim(lower(col(textCol))), "\\s+")).as("__sig"))
      // null-text docs had no rows to aggregate in the original
      // pipeline (explode of null drops them) — the projection form
      // must drop them too, not emit a (id, null) signature row
      .where(col("__sig").isNotNull)

  /** SimHash near-dup pairs: band the 64-bit signature into `bands`
    * equal chunks (any-equal-chunk ⇒ candidate), verify by full
    * Hamming distance.
    *
    * Banding is a DETERMINISTIC recall guarantee by pigeonhole: a pair
    * within hamming ≤ `bands` - 1 must leave some chunk untouched, so
    * it always becomes a candidate. The trade is candidate volume on
    * uncorrelated docs: a random pair collides in some band with
    * P ≈ bands · 2^-(64/bands) — 4×16-bit ≈ 6e-5·n²/2 (sharp filter,
    * guarantee only to h ≤ 3), 8×8-bit ≈ 3e-2·n²/2 (guarantee to
    * h ≤ 7). Choose `bands` ≥ maxHamming + 1 when the gate must be
    * exhaustive; keep the default 4 when the corpus is huge and
    * near-dups are expected to sit at tiny hamming anyway.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      bands: Int = 4): DataFrame = {
    require(bands >= 2 && 64 % bands == 0, "bands must divide 64 (and be ≥ 2)")
    val chunkBits = 64 / bands
    // pinned BEFORE the bands explode: the self-join consumes the frame
    // twice, and pinning here materializes the expensive
    // tokenize→hash→64-sum signature pipeline once at 1× rows — the
    // shift/mask explode below is a trivial map to re-run per consumer
    val signed = Par.pin(simhashSignatures(docs, idCol, textCol))
    val banded = signed.select(
      col("__id"), col("__sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          (shiftright(col("__sig"), b * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)))
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
