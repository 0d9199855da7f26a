package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Multimodal, Similarity}

/** Embedding-similarity + multimodal queries over `embeddings` (64-dim
  * float vectors) and `documents`.
  */
object QueriesVector {

  // -------------------------------------------------------------------
  // Brute-force cosine top-k: exact-recall ANN baseline. Corpus never
  // shuffles — the query set broadcasts.
  // -------------------------------------------------------------------
  def simBruteForceTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Similarity.bruteForceTopK(corpus, queries, k = 5)
      .orderBy("qid", "rank")
  }

  val simBruteForceTopkSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |s AS (SELECT qid, id,
       |  ${dot("qvec", "vec")} / (sqrt(${dot("qvec", "qvec")}) * sqrt(${dot("vec", "vec")})) AS cos
       | FROM q CROSS JOIN c WHERE qid <> id),
       |r AS (SELECT qid, id, round(cos, 6) AS cosine,
       |  row_number() OVER (PARTITION BY qid
       |                     ORDER BY round(cos, 6) DESC, id ASC) AS rank
       | FROM s)
       |SELECT qid, id, cosine, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // IVF top-k — the ANN scale path (probe nProbe of nCells cells). No
  // DuckDB oracle (centroid sampling uses xxhash64): rows-only; recall
  // vs brute force is asserted in SimilaritySpec.
  // -------------------------------------------------------------------
  def simIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val (cells, centroids) = Similarity.ivfAssign(corpus, nCells = 16)
    Similarity.ivfTopK(cells, centroids, queries, k = 5, nProbe = 4)
      .orderBy("qid", "rank")
  }

  // -------------------------------------------------------------------
  // IVF with nProbe = nCells: probes every cell, so the result must
  // EQUAL exact brute force — an oracle-checked end-to-end test of the
  // IVF machinery (centroid routing, per-cell scoring, global top-k).
  // -------------------------------------------------------------------
  def simIvfExact(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val (cells, centroids) = Similarity.ivfAssign(corpus, nCells = 16)
    Similarity.ivfTopK(cells, centroids, queries, k = 5, nProbe = 16)
      .orderBy("qid", "rank")
  }

  // -------------------------------------------------------------------
  // Exact embedding-cosine near-dup pairs over a bounded slice (the
  // verification baseline for the LSH-bucketed scale path — see
  // Similarity.cosineNearDupPairs). The slice keeps the quadratic
  // baseline bounded in the bench battery; the oracle replays the same
  // left-to-right double fold, so cosine is bit-identical and the
  // threshold filter cannot straddle a rounding boundary differently
  // in the two engines.
  // -------------------------------------------------------------------
  def simCosinePairsExact(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.load(spark, dir, "embeddings")
      .where(col("vec_id") < 1000)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.cosinePairsExact(corpus, threshold = 0.35)
      .orderBy("id_a", "id_b")
  }

  val simCosinePairsExactSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
       |           WHERE vec_id < 1000),
       |s AS (SELECT a.id AS id_a, b.id AS id_b,
       |  round(${dot("a.vec", "b.vec")} /
       |    (sqrt(${dot("a.vec", "a.vec")}) * sqrt(${dot("b.vec", "b.vec")})), 6)
       |    AS cosine
       | FROM e a JOIN e b ON a.id < b.id)
       |SELECT id_a, id_b, cosine FROM s WHERE cosine >= 0.35
       |ORDER BY id_a, id_b""".stripMargin
  }

  // -------------------------------------------------------------------
  // End-to-end embedding dedup: cosine near-dup pairs → connected
  // components → one canonical vector per cluster (the embedding
  // analog of dedup_canonical). Pairs come from the exact baseline
  // over the bounded slice so the recursive-CTE oracle can replay
  // them; at full scale the pair source swaps to the LSH-bucketed
  // cosineNearDupPairs with the same downstream CC/canonical stages.
  // Threshold 0.45, deliberately higher than sim_cosine_pairs' 0.35:
  // dedup means HIGH similarity, and on these near-random embeddings
  // a 0.35 cut links long transitive chains (1022 pairs collapsing
  // 1000→153 at sf0.1) whose diameter forces the label-propagation
  // loop through its full iteration budget — a graph no real dedup
  // run would produce. At 0.45 the clusters are tight and small.
  // -------------------------------------------------------------------
  def embedCanonical(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .where(col("vec_id") < 1000)
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val pairs = Similarity.cosinePairsExact(corpus, threshold = 0.45)
      .select("id_a", "id_b")
    graft.operators.ConnectedComponents
      .canonicalize(emb.select("vec_id"), pairs, "vec_id")
      .select("vec_id")
      .orderBy("vec_id")
  }

  val embedCanonicalSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH RECURSIVE e AS (SELECT vec_id AS id, embedding AS vec
       |                     FROM embeddings WHERE vec_id < 1000),
       |s AS (SELECT a.id AS id_a, b.id AS id_b,
       |  round(${dot("a.vec", "b.vec")} /
       |    (sqrt(${dot("a.vec", "a.vec")}) * sqrt(${dot("b.vec", "b.vec")})), 6)
       |    AS cosine
       | FROM e a JOIN e b ON a.id < b.id),
       |pairs AS (SELECT id_a, id_b FROM s WHERE cosine >= 0.45),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, label) AS (
       | SELECT id, id FROM nodes
       | UNION
       | SELECT g.src, r.label FROM edges g JOIN reach r ON g.dst = r.id),
       |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY 1)
       |SELECT v.id AS vec_id FROM e v
       |LEFT JOIN comp ON v.id = comp.id
       |WHERE comp.component IS NULL OR comp.component = v.id
       |ORDER BY vec_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // Per-label embedding statistics (vector math exercised under
  // aggregation; norms flow as integer micro-units).
  // -------------------------------------------------------------------
  def embedLabelStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("label"),
        floor(VectorFunctions.norm(col("embedding")) * 1e6).cast("long")
          .as("norm_u"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(col("norm_u")).as("sum_norm_u"),
        min(col("norm_u")).as("min_norm_u"),
        max(col("norm_u")).as("max_norm_u"))
      .orderBy("label")

  val embedLabelStatsSql: String = {
    val norm =
      "sqrt(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"
    s"""SELECT label, count(*) AS n,
       | CAST(sum(CAST(floor($norm * 1e6) AS BIGINT)) AS BIGINT) AS sum_norm_u,
       | min(CAST(floor($norm * 1e6) AS BIGINT)) AS min_norm_u,
       | max(CAST(floor($norm * 1e6) AS BIGINT)) AS max_norm_u
       |FROM embeddings GROUP BY 1 ORDER BY label""".stripMargin
  }

  // -------------------------------------------------------------------
  // Multimodal decode plumbing: text bytes stand in for media payloads;
  // stub decode runs in mapPartitions; frames explode post-decode.
  // -------------------------------------------------------------------
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val meta = Multimodal.decode(payloads, "doc_id", "payload")
    Multimodal.sampleFrames(meta, every = 2)
      .groupBy("doc_id", "n_bytes", "width", "height", "frames")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("doc_id")
  }

  /** The stub decode is deterministic byte arithmetic, so the oracle
    * replays it relationally (documents are ASCII: octet_length ==
    * n_chars, first byte == unicode of first char).
    */
  val multimodalDecodeSql: String =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
      | CAST(16 + unicode(substr(text, 1, 1)) % 64 AS INTEGER) AS height,
      | CAST(1 + octet_length(encode(text)) % 8 AS INTEGER) AS frames,
      | CAST(ceil((1 + octet_length(encode(text)) % 8) / 2.0) AS BIGINT) AS n_sampled
      |FROM documents ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_bruteforce_topk" -> (simBruteForceTopk _),
    "sim_ivf_topk" -> (simIvfTopk _),
    "sim_cosine_pairs" -> (simCosinePairsExact _),
    "embed_canonical" -> (embedCanonical _),
    "sim_ivf_exact" -> (simIvfExact _),
    "embed_label_stats" -> (embedLabelStats _),
    "multimodal_decode" -> (multimodalDecode _))

  val oracles: Map[String, String] = Map(
    "sim_bruteforce_topk" -> simBruteForceTopkSql,
    "sim_ivf_exact" -> simBruteForceTopkSql, // nProbe=nCells ⇒ exact
    "sim_cosine_pairs" -> simCosinePairsExactSql,
    "embed_canonical" -> embedCanonicalSql,
    "embed_label_stats" -> embedLabelStatsSql,
    "multimodal_decode" -> multimodalDecodeSql)
}
