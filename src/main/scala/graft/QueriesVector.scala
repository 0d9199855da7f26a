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
  // IVF top-k — the ANN scale path (probe nProbe=4 of 16 cells), with a
  // FULL DuckDB replay oracle: centroids are a deterministic slice
  // (vec_id < 16) instead of the default xxhash64 sample, so the oracle
  // can re-derive the whole approximate path — centroid assignment
  // (argmax cosine, ties to smallest cid), query routing (4 nearest
  // centroids), per-cell scoring, global top-k — and the compare is
  // hash-exact on the APPROXIMATE answer itself, misses included. The
  // production default (hash-sampled centroids, Similarity.ivfAssign)
  // stays covered end-to-end by sim_ivf_exact below. Cosines are
  // left-to-right double folds in both engines → bit-identical, so the
  // full-precision ORDER BYs in assignment/routing can't diverge.
  // -------------------------------------------------------------------
  def simIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val centroids = emb.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cells = Similarity.ivfAssignTo(corpus, centroids)
    Similarity.ivfTopK(cells, centroids, queries, k = 5, nProbe = 4)
      .orderBy("qid", "rank")
  }

  val simIvfTopkSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    def cos(a: String, b: String) =
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"""WITH c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
       |         WHERE vec_id < 16),
       |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
       |      WHERE vec_id < 8),
       |asg AS (SELECT id, vec, cid, row_number() OVER (PARTITION BY id
       |    ORDER BY ${cos("vec", "cvec")} DESC, cid ASC) AS rn
       |  FROM c CROSS JOIN cent),
       |cells AS (SELECT id, vec, cid AS cell FROM asg WHERE rn = 1),
       |pr AS (SELECT qid, qvec, cid, row_number() OVER (PARTITION BY qid
       |    ORDER BY ${cos("qvec", "cvec")} DESC, cid ASC) AS rn
       |  FROM q CROSS JOIN cent),
       |probes AS (SELECT qid, qvec, cid AS cell FROM pr WHERE rn <= 4),
       |s AS (SELECT p.qid, c.id, round(${cos("p.qvec", "c.vec")}, 6) AS cosine
       |  FROM cells c JOIN probes p ON c.cell = p.cell WHERE p.qid <> c.id),
       |r AS (SELECT qid, id, cosine, row_number() OVER (PARTITION BY qid
       |    ORDER BY cosine DESC, id ASC) AS rank FROM s)
       |SELECT qid, id, cosine, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // FILTERED vector search: top-k among the vectors matching a
  // metadata predicate (label = 3) — the "search within this
  // collection/tenant/language" shape every retrieval stack needs.
  // PRE-filtering semantics (the filter scopes the candidate set, so k
  // results are guaranteed when the scope has k vectors — post-filter
  // k-then-discard does not). Per-row cell assignment commutes with a
  // row predicate, so the filter applies before assignment here; on the
  // disk index the same predicate rides the `cell=N/` scan as an
  // ordinary pushed filter (label as a skipping/partition column at
  // scale). Full-replay oracle: same deterministic centroid slice as
  // sim_ivf_topk, plus the WHERE.
  // -------------------------------------------------------------------
  def simFilteredTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.where(col("label") === 3)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val centroids = emb.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cells = Similarity.ivfAssignTo(corpus, centroids)
    Similarity.ivfTopK(cells, centroids, queries, k = 5, nProbe = 4)
      .orderBy("qid", "rank")
  }

  val simFilteredTopkSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    def cos(a: String, b: String) =
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"""WITH c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
       |           WHERE label = 3),
       |cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
       |         WHERE vec_id < 16),
       |q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
       |      WHERE vec_id < 8),
       |asg AS (SELECT id, vec, cid, row_number() OVER (PARTITION BY id
       |    ORDER BY ${cos("vec", "cvec")} DESC, cid ASC) AS rn
       |  FROM c CROSS JOIN cent),
       |cells AS (SELECT id, vec, cid AS cell FROM asg WHERE rn = 1),
       |pr AS (SELECT qid, qvec, cid, row_number() OVER (PARTITION BY qid
       |    ORDER BY ${cos("qvec", "cvec")} DESC, cid ASC) AS rn
       |  FROM q CROSS JOIN cent),
       |probes AS (SELECT qid, qvec, cid AS cell FROM pr WHERE rn <= 4),
       |s AS (SELECT p.qid, c.id, round(${cos("p.qvec", "c.vec")}, 6) AS cosine
       |  FROM cells c JOIN probes p ON c.cell = p.cell WHERE p.qid <> c.id),
       |r AS (SELECT qid, id, cosine, row_number() OVER (PARTITION BY qid
       |    ORDER BY cosine DESC, id ASC) AS rank FROM s)
       |SELECT qid, id, cosine, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
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
  // k-means-trained IVF centroids (Similarity.kmeansCentroids), FULL
  // DuckDB replay: init = the deterministic vec_id<8 slice (the same
  // trick that made sim_ivf_* replayable — hash-sampling isn't portable,
  // a key slice is), 2 Lloyd iterations, k=8 over the vec_id<1000
  // corpus. Centroid updates are exact integer micro-unit SUM vectors
  // (cosine is scale-invariant, so the unnormalized sum assigns like
  // the mean while summing order-independently) — so the oracle can
  // replay assignment (argmax cosine, ties→min cid), per-cell sums and
  // empty-cell retention round by round, and the final centroids
  // compare EXACTLY, no float-mean tolerance anywhere.
  // -------------------------------------------------------------------
  def kmeansCentroids(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.load(spark, dir, "embeddings")
      .where(col("vec_id") < 1000)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val init = corpus.where(col("id") < 8)
      .select(col("id").as("cid"),
        transform(col("vec"), x => x.cast("double")).as("cvec"))
    Similarity.kmeansCentroids(corpus, dim = 64, init, iters = 2)
      .select(col("cid"), posexplode(col("cvec")))
      .select(col("cid"), (col("pos") + 1).cast("long").as("d"),
        col("col").as("v"))
      .orderBy("cid", "d")
  }

  val kmeansCentroidsSql: String = {
    def dotVV(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    def iter(i: Int): String = {
      val prev = s"c${i - 1}"
      s"""a$i AS (
         | SELECT id, vec, cid, row_number() OVER (
         |   PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
         | FROM (SELECT m.id, m.vec, c.cid,
         |   ${dotVV("m.vec", "c.cv")} /
         |     (sqrt(${dotVV("m.vec", "m.vec")}) * sqrt(${dotVV("c.cv", "c.cv")})) AS cos
         |  FROM e m CROSS JOIN $prev c)),
         |s$i AS (
         | SELECT cid, d, CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sv
         | FROM (SELECT cid, unnest(vec) AS v, unnest(range(1, 65)) AS d
         |       FROM a$i WHERE rn = 1)
         | GROUP BY cid, d),
         |c$i AS (
         | SELECT o.cid, coalesce(n.cv, o.cv) AS cv
         | FROM $prev o LEFT JOIN (
         |   SELECT cid, list(CAST(sv AS DOUBLE) ORDER BY d) AS cv
         |   FROM s$i GROUP BY cid) n ON o.cid = n.cid)""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
       |           WHERE vec_id < 1000),
       |c0 AS (SELECT id AS cid,
       |        list_transform(range(1, 65), i -> CAST(vec[i] AS DOUBLE)) AS cv
       |       FROM e WHERE id < 8),
       |${iter(1)},
       |${iter(2)}
       |SELECT cid, unnest(range(1, 65)) AS d, unnest(cv) AS v
       |FROM c2 ORDER BY cid, d""".stripMargin
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
  // Hyperplane-LSH cosine near-dup pairs — the 100 TB cosine-dedup
  // path itself (bucketed signature self-join, NOT the exact quadratic
  // baseline), under a FULL DuckDB replay oracle. The LSH planes are
  // derived from xxhash64 of LITERALS (VectorFunctions
  // .hyperplaneSignature), i.e. they are compile-time constants: we
  // evaluate the same hash here and embed the 16×64 plane components
  // into the oracle SQL, so DuckDB replays signature bits, band
  // buckets, candidate join and the exact-cosine filter — the compare
  // is hash-exact on the LSH answer itself, band misses included (no
  // probabilistic-recall assumption anywhere).
  // -------------------------------------------------------------------
  def simLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.load(spark, dir, "embeddings")
      .where(col("vec_id") < 1000)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.cosineNearDupPairs(corpus, dim = 64, threshold = 0.45,
      bits = 16, bands = 4)
      .orderBy("id_a", "id_b")
  }

  val simLshPairsSql: String = {
    import graft.functions.HyperplaneSigExpr.planeComponent
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    // bit p of the signature: sign of the plane-p dot product. Plane
    // components are embedded via Double.toString (shortest-roundtrip,
    // parses back to the identical double); the multiply-and-left-fold
    // matches hyperplaneSignature's comps.reduce(_ + _) order, which
    // DuckDB's list_sum reproduces (proven bit-exact by the
    // sim_cosine_pairs dot products).
    def bit(p: Int): String = {
      val consts = (0 until 64).map(j => planeComponent(p, j).toString).mkString(", ")
      s"(CASE WHEN list_sum(list_transform(range(1, 65), j -> ([$consts][j]) * CAST(vec[j] AS DOUBLE))) >= 0 THEN 1 ELSE 0 END) AS b$p"
    }
    val bits = (0 until 16).map(bit).mkString(",\n ")
    // 4 bands of 4 bits: chunk b = bits [4b, 4b+4), little-endian
    def chunk(b: Int): String =
      (0 until 4).map(i => s"${1 << i} * b${4 * b + i}").mkString(" + ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT id, $b AS band, ${chunk(b)} AS chunk FROM sig").mkString("\n UNION ALL ")
    s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
       |           WHERE vec_id < 1000),
       |sig AS (SELECT id, vec,
       | $bits
       | FROM e),
       |bands AS (
       | $bandSelects),
       |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.chunk = y.chunk AND x.id < y.id),
       |p AS (SELECT id_a, id_b,
       |  round(${dot("a.vec", "b.vec")} /
       |    (sqrt(${dot("a.vec", "a.vec")}) * sqrt(${dot("b.vec", "b.vec")})), 6)
       |    AS cosine
       | FROM cand JOIN e a ON a.id = id_a JOIN e b ON b.id = id_b)
       |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.45
       |ORDER BY id_a, id_b""".stripMargin
  }

  // -------------------------------------------------------------------
  // Incremental embedding near-dup against a persisted hyperplane
  // signature index — the vector twin of dedup_incremental: the
  // corpus (vec_id % 5 != 0) is known only through its 8-byte-per-
  // vector (id, sig) index, persisted and read back; the batch
  // (vec_id % 5 == 0) is hashed fresh and band-probed against it;
  // corpus VECTORS are fetched only for colliding candidates. Oracle =
  // the full hyperplane replay of sim_lsh_pairs restricted to pairs
  // with at least one side in the batch — corpus-internal pairs must
  // not reappear, cross pairs must all surface.
  // -------------------------------------------------------------------
  def simLshIncremental(spark: SparkSession, dir: String): DataFrame = {
    val slice = Tables.load(spark, dir, "embeddings")
      .where(col("vec_id") < 1000)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val batch = slice.where(col("id") % 5 === 0)
    val prior = slice.where(col("id") % 5 =!= 0)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_hp_idx").toString + "/index"
    Similarity.hyperplaneIndex(prior, dim = 64, bits = 16)
      .write.parquet(idxPath)
    Similarity.cosineNearDupIncremental(
      prior, spark.read.parquet(idxPath), batch,
      dim = 64, threshold = 0.45, bits = 16, bands = 4)
      .orderBy("id_a", "id_b")
  }

  /** The one-shot replay restricted to batch-involving pairs — string
    * surgery on [[simLshPairsSql]]'s candidate CTE, kept adjacent so
    * the two stay in sync.
    */
  val simLshIncrementalSql: String = {
    val anchor = "ON x.band = y.band AND x.chunk = y.chunk AND x.id < y.id)"
    require(simLshPairsSql.contains(anchor), "sim_lsh_pairs SQL changed")
    simLshPairsSql.replace(anchor,
      anchor.stripSuffix(")") +
        "\n  WHERE x.id % 5 = 0 OR y.id % 5 = 0)")
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
  // Multimodal decode — REAL codec round-trip. Each document derives a
  // deterministic image shape (dims from its text), gets ENCODED as an
  // actual PNG and DECODED back with javax.imageio inside
  // mapPartitions; width/height/pixel_sum in the output are MEASURED
  // from the decoded raster, not carried through. The frame count is a
  // typed METADATA column riding next to the binary (a PNG has no frame
  // count to measure — exactly the property the multimodal contract
  // says travels as metadata), driving the post-decode frame-sample
  // explode. The oracle replays the generator formulas relationally —
  // so a green row proves encode∘decode is an identity on dims and
  // pixel content (documents are ASCII: octet_length == n_chars).
  // -------------------------------------------------------------------
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shaped = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (lit(16) + octet_length(col("text")) % 64).cast("int").as("w"),
        (lit(16) + ascii(substring(col("text"), 1, 1)) % 64).cast("int").as("h"),
        (lit(1) + octet_length(col("text")) % 8).cast("int").as("frames"))
    // widened: the codec work is CPU-heavy per row and the small
    // parquet arrives as one split — unwidened, every PNG encodes on a
    // single core (measured 4 s at sf0.1 vs <1 s widened)
    val payloads = graft.operators.Par.widen(
      shaped.select(col("doc_id"), col("w"), col("h")))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        // per-partition codec context (see Multimodal.decode scaladoc)
        it.map { case (id, w, h) => (id, Multimodal.encodePng(id, w, h)) }
      }
      .toDF("doc_id", "payload")
    val meta = Multimodal.decode(payloads, "doc_id", "payload")
    val withFrames = meta.join(shaped.select("doc_id", "frames"), "doc_id")
    Multimodal.sampleFrames(withFrames, every = 2)
      .groupBy("doc_id", "width", "height", "n_pixels", "pixel_sum", "frames")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("doc_id")
  }

  /** Replays the image GENERATOR formulas (dims and the pixel function)
    * relationally; the Spark side must measure the same values back out
    * of real PNG bytes for the row to hash-match.
    */
  val multimodalDecodeSql: String =
    """WITH d AS (SELECT doc_id,
      |  CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
      |  CAST(16 + unicode(substr(text, 1, 1)) % 64 AS INTEGER) AS height,
      |  CAST(1 + octet_length(encode(text)) % 8 AS INTEGER) AS frames
      | FROM documents)
      |SELECT doc_id, width, height,
      | CAST(width AS BIGINT) * height AS n_pixels,
      | CAST(list_sum(list_transform(range(0, width * height),
      |   i -> ((i % width) * 31 + (i // width) * 17 + doc_id) % 256))
      |   AS BIGINT) AS pixel_sum,
      | frames,
      | CAST(ceil(frames / 2.0) AS BIGINT) AS n_sampled
      |FROM d ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // Audio leg of the multimodal plumbing: REAL PCM-in-WAV payloads
  // (RIFF header, 16-bit LE samples) built per doc in mapPartitions,
  // then DECODED — magic/format validation + sample scan — to measured
  // n_samples / peak / energy. The oracle replays the deterministic
  // waveform generator relationally; the Spark side must parse actual
  // bytes to hash-match it, exactly the image leg's contract.
  // -------------------------------------------------------------------
  def multimodalAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shaped = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (lit(50) + octet_length(col("text")) % 200).cast("int").as("ns"),
        (lit(1) + ascii(substring(col("text"), 1, 1)) % 97).cast("int")
          .as("seed"))
    val payloads = graft.operators.Par.widen(shaped)
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, ns, seed) =>
        (id, Multimodal.encodeWav(id, ns, seed)) })
      .toDF("doc_id", "payload")
    Multimodal.decodeAudio(payloads, "doc_id", "payload")
      .orderBy("doc_id")
  }

  val multimodalAudioSql: String =
    """WITH shaped AS (SELECT doc_id,
      |  CAST(50 + octet_length(encode(text)) % 200 AS INTEGER) AS ns,
      |  CAST(1 + unicode(substr(text, 1, 1)) % 97 AS INTEGER) AS seed
      | FROM documents),
      |ks AS (SELECT doc_id, seed, unnest(range(0, ns)) AS k FROM shaped),
      |v AS (SELECT doc_id,
      |        ((doc_id * 31 + k * seed + 7) % 65536) - 32768 AS sv
      |      FROM ks)
      |SELECT doc_id,
      | CAST(count(*) AS BIGINT) AS n_samples,
      | CAST(max(abs(sv)) AS BIGINT) AS peak,
      | CAST(sum(sv * sv) AS BIGINT) AS energy
      |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // IVF index drift monitor (Similarity.assignFit) — the retrain signal
  // for incremental index maintenance (Similarity.appendIndex): the
  // corpus splits into a "training era" (vec_id%10 < 8) and "new
  // arrivals" (%10 >= 8); each half's winning-cosine fit against the
  // deterministic vec_id<16 centroid slice is summed in exact 1e-6
  // micro-units, so the DuckDB replay (same argmax, same floor) is
  // hash-exact. Consumers compare mean fits: delta mean well below base
  // mean ⇒ the centroids no longer describe incoming data ⇒ retrain.
  // -------------------------------------------------------------------
  def simIvfDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val centroids = emb.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val b = Similarity.assignFit(corpus.where(col("id") % 10 < 8), centroids)
      .select(col("n").as("n_base"), col("fit_sum_u").as("base_fit_u"))
    val d = Similarity.assignFit(corpus.where(col("id") % 10 >= 8), centroids)
      .select(col("n").as("n_delta"), col("fit_sum_u").as("delta_fit_u"))
    b.crossJoin(d)
  }

  val simIvfDriftSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
       |         WHERE vec_id < 16),
       |asg AS (SELECT id, cos, row_number() OVER (PARTITION BY id
       |    ORDER BY cos DESC, cid ASC) AS rn
       |  FROM (SELECT c.id, cent.cid,
       |    ${dot("c.vec", "cent.cvec")} /
       |      (sqrt(${dot("c.vec", "c.vec")}) * sqrt(${dot("cent.cvec", "cent.cvec")})) AS cos
       |   FROM c CROSS JOIN cent)),
       |best AS (SELECT id, CAST(floor(cos * 1000000) AS BIGINT) AS fit_u
       |         FROM asg WHERE rn = 1)
       |SELECT
       | count(*) FILTER (WHERE id % 10 < 8) AS n_base,
       | CAST(sum(fit_u) FILTER (WHERE id % 10 < 8) AS BIGINT) AS base_fit_u,
       | count(*) FILTER (WHERE id % 10 >= 8) AS n_delta,
       | CAST(sum(fit_u) FILTER (WHERE id % 10 >= 8) AS BIGINT) AS delta_fit_u
       |FROM best""".stripMargin
  }

  // -------------------------------------------------------------------
  // Int8-quantized ANN (Similarity.quantizeUnit + quantizedTopK): each
  // vector L2-normalizes then maps to floor(x/||v||*127) ∈ [-127,127],
  // and top-k runs on EXACT INTEGER dot products — 4× smaller vectors
  // and a ranking with no float-order hazard at all, so the DuckDB
  // replay (same fold for the norm, same floor, same integer sums) is
  // hash-exact on the quantized answer itself.
  // -------------------------------------------------------------------
  // -------------------------------------------------------------------
  // Product-quantization ANN (operators/Pq.scala): 8 subspaces × 16
  // codes, ADC scoring through broadcast per-query lookup tables,
  // exact-cosine rescoring of the 100-deep shortlist. FULL-replay
  // oracle in the sim_ivf_topk style: the codebook is a deterministic
  // slice (vec_id < 16) so DuckDB re-derives the whole approximate
  // path — subspace argmin codes, lookup tables, approx ranking,
  // shortlist cut, exact rescore — and the compare is hash-exact on
  // the APPROXIMATE answer, misses included (this synthetic corpus's
  // neighbors sit at the noise floor, so recall itself is data-bound;
  // what the gate pins is that the PQ pipeline computes exactly what
  // it claims). All distances/dots are left-to-right double folds in
  // both engines. The production hash-sampled codebook stays covered
  // by PqSpec.
  // -------------------------------------------------------------------
  def simPqTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cb = graft.operators.Pq.codebookFrom(
      emb.where(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("vec")),
      dim = 64, m = 8)
    val enc = graft.operators.Pq.encode(corpus, cb, dim = 64, m = 8)
    graft.operators.Pq.topK(enc, queries, cb, dim = 64, m = 8,
      k = 5, shortlist = 100)
      .orderBy("qid", "rank")
  }

  val simPqTopkSql: String = {
    def dot64(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |subs AS (SELECT unnest(range(0, 8)) AS sub),
       |cb AS (SELECT sub, id AS cid,
       |  list_transform(range(sub*8 + 1, sub*8 + 9),
       |                 i -> CAST(vec[i] AS DOUBLE)) AS cvec
       | FROM e, subs WHERE id < 16),
       |dists AS (SELECT x.id, c.sub, c.cid,
       |  list_sum(list_transform(range(1, 9),
       |    i -> (c.cvec[i] - CAST(x.vec[c.sub*8 + i] AS DOUBLE))
       |       * (c.cvec[i] - CAST(x.vec[c.sub*8 + i] AS DOUBLE)))) AS d
       | FROM e x CROSS JOIN cb c),
       |codes AS (SELECT id, list(cid ORDER BY sub) AS codes FROM (
       |  SELECT id, sub, cid, row_number() OVER (PARTITION BY id, sub
       |    ORDER BY d ASC, cid ASC) AS rn FROM dists) WHERE rn = 1
       | GROUP BY id),
       |nr AS (SELECT id, sqrt(${dot64("vec", "vec")}) AS nrm FROM e),
       |q AS (SELECT id AS qid, vec AS qvec FROM e WHERE id < 8),
       |qt AS (SELECT qid, list(dotv ORDER BY sub, cid) AS qt FROM (
       |  SELECT q.qid, c.sub, c.cid,
       |    list_sum(list_transform(range(1, 9),
       |      i -> c.cvec[i] * CAST(q.qvec[c.sub*8 + i] AS DOUBLE))) AS dotv
       |  FROM q CROSS JOIN cb c) GROUP BY qid),
       |ap AS (SELECT qt.qid, cd.id,
       |  list_sum(list_transform(range(0, 8),
       |    s -> qt.qt[s*16 + cd.codes[s + 1] + 1]))
       |  / nullif(nr.nrm, 0.0) AS approx
       | FROM codes cd CROSS JOIN qt JOIN nr ON nr.id = cd.id
       | WHERE qt.qid <> cd.id),
       |sl AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
       |   ORDER BY approx DESC, id ASC) AS srank FROM ap),
       |ex AS (SELECT s.qid, s.id,
       |  round(${dot64("q.qvec", "x.vec")}
       |        / (sqrt(${dot64("q.qvec", "q.qvec")})
       |           * sqrt(${dot64("x.vec", "x.vec")})), 6) AS cosine
       | FROM sl s JOIN q ON q.qid = s.qid JOIN e x ON x.id = s.id
       | WHERE s.srank <= 100),
       |r AS (SELECT qid, id, cosine, row_number() OVER (PARTITION BY qid
       |   ORDER BY cosine DESC, id ASC) AS rank FROM ex)
       |SELECT qid, id, cosine, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  def simQuantizedTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Similarity.quantizeUnit(corpus)
    Similarity.quantizedTopK(q, q.where(col("id") < 8), k = 5)
      .orderBy("qid", "rank")
  }

  val simQuantizedTopkSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH e AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |n AS (SELECT id, vec, sqrt(${dot("vec", "vec")}) AS nr FROM e),
       |q AS (SELECT id, list_transform(range(1, 65),
       |        i -> CAST(floor(CAST(vec[i] AS DOUBLE) / nr * 127) AS INTEGER))
       |        AS qvec FROM n),
       |s AS (SELECT a.id AS qid, b.id AS id,
       |  CAST(list_sum(list_transform(range(1, 65),
       |    i -> CAST(a.qvec[i] AS BIGINT) * b.qvec[i])) AS BIGINT) AS score
       | FROM q a JOIN q b ON a.id <> b.id WHERE a.id < 8),
       |r AS (SELECT qid, id, score, row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, id ASC) AS rank FROM s)
       |SELECT qid, id, score, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  // -------------------------------------------------------------------
  // kNN label evaluation — validating a quality/topic classifier by
  // nearest-neighbor vote, the standard embedding-space sanity check
  // before trusting labels at corpus scale: each query vector's label
  // is predicted by majority vote of its 5 nearest neighbors
  // (excluding itself; vote ties resolve deterministically to the
  // SMALLEST label — similarity is not consulted in the tie-break),
  // and per-label accuracy comes back. Full DuckDB replay via the same
  // bit-identical cosine fold.
  //
  // Broadcast direction matters at scale: the SMALL frames here are
  // the top-k result (|queries|·k rows) and the predictions
  // (|queries| rows) — those broadcast; the corpus-sized label map
  // streams from its scan and never ships to the driver.
  // -------------------------------------------------------------------
  def knnLabelEval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val labels = emb.select(col("vec_id").as("id"),
      col("label").as("nbr_label"))
    val queries = emb.where(col("vec_id") < 200)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val topk = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("qid", "id")
    val votes = labels.join(broadcast(topk), "id")
      .groupBy("qid", "nbr_label").agg(count(lit(1)).as("nv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("nv").desc, col("nbr_label").asc)
    val pred = votes
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("qid"), col("nbr_label").as("pred"))
    emb.select(col("vec_id").as("qid"), col("label").as("truth"))
      .join(broadcast(pred), "qid")
      .groupBy("truth")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("pred") === col("truth"), 1L).otherwise(0L))
          .as("n_correct"))
      .orderBy("truth")
  }

  val knnLabelEvalSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""WITH c AS (SELECT vec_id AS id, embedding AS vec, label FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qvec, label AS truth
       |      FROM embeddings WHERE vec_id < 200),
       |s AS (SELECT qid, id,
       |  round(${dot("qvec", "vec")} /
       |    (sqrt(${dot("qvec", "qvec")}) * sqrt(${dot("vec", "vec")})), 6)
       |    AS cosine
       | FROM q CROSS JOIN c WHERE qid <> id),
       |topk AS (SELECT qid, id FROM (
       |  SELECT qid, id, row_number() OVER (PARTITION BY qid
       |    ORDER BY cosine DESC, id ASC) AS rank FROM s) WHERE rank <= 5),
       |votes AS (
       | SELECT t.qid, c.label AS nbr_label, count(*) AS nv
       | FROM topk t JOIN c ON c.id = t.id GROUP BY 1, 2),
       |pred AS (SELECT qid, nbr_label AS pred FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY nv DESC, nbr_label ASC) AS rn FROM votes) WHERE rn = 1)
       |SELECT q.truth, count(*) AS n_queries,
       | CAST(sum(CASE WHEN p.pred = q.truth THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_correct
       |FROM pred p JOIN q ON q.qid = p.qid
       |GROUP BY q.truth ORDER BY q.truth""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_label_eval" -> (knnLabelEval _),
    "sim_quantized_topk" -> (simQuantizedTopk _),
    "sim_pq_topk" -> (simPqTopk _),
    "sim_ivf_drift" -> (simIvfDrift _),
    "sim_bruteforce_topk" -> (simBruteForceTopk _),
    "sim_ivf_topk" -> (simIvfTopk _),
    "sim_filtered_topk" -> (simFilteredTopk _),
    "sim_cosine_pairs" -> (simCosinePairsExact _),
    "sim_lsh_pairs" -> (simLshPairs _),
    "sim_lsh_incremental" -> (simLshIncremental _),
    "kmeans_centroids" -> (kmeansCentroids _),
    "embed_canonical" -> (embedCanonical _),
    "sim_ivf_exact" -> (simIvfExact _),
    "embed_label_stats" -> (embedLabelStats _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_audio" -> (multimodalAudio _))

  val oracles: Map[String, String] = Map(
    "knn_label_eval" -> knnLabelEvalSql,
    "sim_quantized_topk" -> simQuantizedTopkSql,
    "sim_ivf_drift" -> simIvfDriftSql,
    "sim_bruteforce_topk" -> simBruteForceTopkSql,
    "sim_ivf_topk" -> simIvfTopkSql, // full replay: see simIvfTopk notes
    "sim_filtered_topk" -> simFilteredTopkSql, // full replay + label WHERE
    "sim_ivf_exact" -> simBruteForceTopkSql, // nProbe=nCells ⇒ exact
    "sim_pq_topk" -> simPqTopkSql, // full replay: see simPqTopk notes
    "sim_cosine_pairs" -> simCosinePairsExactSql,
    "sim_lsh_pairs" -> simLshPairsSql,
    "sim_lsh_incremental" -> simLshIncrementalSql,
    "kmeans_centroids" -> kmeansCentroidsSql,
    "embed_canonical" -> embedCanonicalSql,
    "embed_label_stats" -> embedLabelStatsSql,
    "multimodal_decode" -> multimodalDecodeSql,
    "multimodal_audio" -> multimodalAudioSql)
}
