package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization (PQ) for approximate nearest neighbor: each
  * vector is encoded as `m` small codes (one per dimension subspace),
  * queries score candidates through a per-query lookup table instead
  * of touching raw vectors, and an exact-cosine rescoring pass over
  * the shortlist restores exact ranking — the memory-bound ANN path
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011) complementing the compute-bound IVF route
  * ([[Similarity.ivfTopK]]).
  *
  * 100 TB shape:
  *   - The codebook is k·m tiny rows (hash-sampled corpus subvectors —
  *     the same deterministic seeding as IVF centroids), collapsed to
  *     ONE broadcast row of structs; encoding is a pure argmin
  *     expression inside the corpus scan — zero corpus shuffle, and
  *     the persisted code table is m bytes/vector instead of 4·dim
  *     (32× smaller at dim=64/m=8: the entire point — the code table
  *     of a corpus whose raw vectors span 100 TB fits in cluster RAM).
  *   - ADC scoring reads ONLY codes + the broadcast query tables:
  *     sum of m array lookups per (query, vector).
  *   - The shortlist window shuffles (qid, approx) pairs — bounded by
  *     |queries|·|corpus| scores, never raw vectors; rescoring touches
  *     `shortlist` vectors per query.
  * Approximation contract: top-k is exact iff the shortlist recalls
  * the true top-k (oracle-checked in `sim_pq_topk` — the driver gate
  * fails if PQ recall ever drops below total on the test corpus).
  */
object Pq {

  /** Deterministic codebook: the `k` corpus vectors with smallest
    * xxhash64(id) donate their subvectors (the IVF centroid seeding).
    * Rows (sub, cid, cvec), cvec DOUBLE, cid 0..k-1 stable under the
    * (hash, id) order. */
  def codebook(corpus: DataFrame, dim: Int, m: Int, k: Int): DataFrame = {
    val seed = corpus
      .select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
      .orderBy(col("h"), col("id")).limit(k)
    // k rows: the single-partition window is bounded by k, not corpus
    val wk = Window.orderBy(col("h"), col("id"))
    codebookFrom(
      seed.withColumn("cid", (row_number().over(wk) - 1).cast("int")),
      dim, m)
  }

  /** Codebook from caller-chosen seed rows (cid, vec) — e.g. an
    * oracle-replayable deterministic slice. */
  def codebookFrom(seed: DataFrame, dim: Int, m: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    seed
      .select(col("cid"), explode(expr(s"sequence(0, ${m - 1})")).as("sub"),
        col("vec"))
      .select(col("sub"), col("cid"),
        expr(s"transform(slice(vec, sub * $subDim + 1, $subDim)," +
          " x -> cast(x as double))").as("cvec"))
  }

  /** Codebook collapsed to one broadcastable row, sorted by (sub, cid)
    * so flat lookup-table indexes are `sub*k + cid`. */
  private def collapsed(codebook: DataFrame): DataFrame =
    codebook.groupBy()
      .agg(sort_array(collect_list(struct(col("sub"), col("cid"),
        col("cvec")))).as("cb"))

  private def l2(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> " +
      "(cast(x as double) - cast(y as double)) * " +
      "(cast(x as double) - cast(y as double))), cast(0.0 as double), " +
      "(acc, v) -> acc + v)"

  /** (id, vec, nrm, codes array<int>[m]): per-subspace nearest-centroid
    * codes plus the EXACT vector norm, computed map-side against the
    * broadcast codebook. The stored norm lets cosine ranking survive
    * quantization: ADC approximates only the numerator dot(q, x), the
    * |x| denominator stays exact (one double per vector — negligible
    * next to the m-byte code). */
  def encode(corpus: DataFrame, codebook: DataFrame, dim: Int, m: Int)
      : DataFrame = {
    val subDim = dim / m
    corpus.crossJoin(broadcast(collapsed(codebook)))
      .select(col("id"), col("vec"),
        VectorFunctions.norm(col("vec")).as("nrm"), expr(
        s"""transform(sequence(0, ${m - 1}), s ->
           |  aggregate(
           |    transform(filter(cb, e -> e.sub = s),
           |      e -> struct(e.cid as cid,
           |        ${l2("e.cvec", s"slice(vec, s * $subDim + 1, $subDim)")} as d)),
           |    struct(cast(-1 as int) as cid, cast('Infinity' as double) as d),
           |    (acc, x) -> if(x.d < acc.d, x, acc)
           |  ).cid)""".stripMargin).as("codes"))
  }

  /** ADC top-k: approximate by code-table lookups, exact-rescore the
    * `shortlist` best per query, emit exact (qid, id, cosine, rank ≤ k)
    * in [[Similarity.bruteForceTopK]]'s output shape. */
  def topK(
      encoded: DataFrame, // (id, vec, codes)
      queries: DataFrame, // (qid, qvec)
      codebook: DataFrame,
      dim: Int,
      m: Int,
      k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must cover k")
    val subDim = dim / m
    // per-query flat lookup table qt[sub*k + cid] = dot(q_sub, cvec)
    val qtab = queries.crossJoin(broadcast(collapsed(codebook)))
      .select(col("qid"), col("qvec"), expr(
        s"""transform(cb, e ->
           |  aggregate(
           |    zip_with(e.cvec, slice(qvec, e.sub * $subDim + 1, $subDim),
           |      (x, y) -> x * cast(y as double)),
           |    cast(0.0 as double), (acc, v) -> acc + v))""".stripMargin)
        .as("qt"))
    val scored = encoded.crossJoin(broadcast(qtab))
      .where(!(col("qid") <=> col("id")))
      // approx cosine: quantized numerator over the EXACT stored norm
      // (ranking by raw ADC dot would systematically mis-rank
      // unnormalized corpora however good the codebook is). The
      // per-subspace code count is derived from the table itself
      // (size(qt) div m) — a caller-supplied count could silently
      // misindex the flat table.
      .withColumn("approx", expr(
        s"""aggregate(sequence(0, ${m - 1}), cast(0.0 as double),
           |  (acc, s) -> acc + element_at(qt, cast(
           |    s * (size(qt) div $m) + element_at(codes, s + 1) + 1
           |    as int)))
           |/ nullif(nrm, 0.0)""".stripMargin))
    val wShort = Window.partitionBy(col("qid"))
      .orderBy(col("approx").desc, col("id").asc)
    val wExact = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored
      .withColumn("srank", row_number().over(wShort))
      .where(col("srank") <= shortlist)
      .withColumn("cosine",
        round(VectorFunctions.cosine(col("qvec"), col("vec")), 6))
      .withColumn("rank", row_number().over(wExact))
      .where(col("rank") <= k)
      .select(col("qid"), col("id"), col("cosine"), col("rank"))
  }
}
