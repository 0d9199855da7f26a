package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FingerprintExpr, TextFunctions}
import graft.operators.{Dedup, Par}

/** Text-analysis + deduplication queries over the `documents` table —
  * the training-data-pipeline operator surface. The testdata plants 25
  * near-duplicate pairs (Jaccard ≈ 0.99; every other pair < 0.1), so
  * dedup queries have a crisp expected answer.
  *
  * MinHash/SimHash signatures themselves are not DuckDB-replayable
  * (xxhash64), so their queries end in an exact-Jaccard verification
  * stage and share the exact-pair oracle: green ⇔ the probabilistic
  * blocker achieved full recall on the planted pairs (probability
  * bounds in each query's scaladoc; the hamming/banding bridge is
  * additionally property-tested in DedupSpec).
  */
object QueriesText {

  /** Shared DuckDB-oracle SQL fragments — the single home for formulas
    * that appear in several oracles (token count, quality score,
    * lang-id argmax, the rolling-hash fingerprint, the shingle→pairs→
    * connected-components CTE chain). An edit here changes every
    * dependent oracle together instead of desynchronizing one embedded
    * copy.
    */
  private object Frag {
    val rt = "regexp_replace(text, '^\\s+|\\s+$', '', 'g')"
    val toks = s"str_split_regex($rt, '\\s+')"
    val lowToks = "str_split_regex(trim(lower(text)), '\\s+')"
    val nTok = s"CASE WHEN $rt = '' THEN 0 ELSE len($toks) END"
    val stops = Seq("the", "a", "and", "of", "to", "in", "is")
      .map(w => s"len(list_filter($lowToks, t -> t = '$w'))")
      .mkString(" + ")
    val punct =
      s"CASE WHEN length(text) = 0 THEN 0.0 ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0 / length(text) END"
    val mwl =
      s"CASE WHEN $nTok = 0 THEN 0.0 ELSE length(regexp_replace(text, '\\s+', '', 'g')) * 1.0 / $nTok END"
    val stopRatio =
      s"CASE WHEN $nTok = 0 THEN 0.0 ELSE ($stops) * 1.0 / $nTok END"
    val quality =
      s"""least(length(text) / 200.0, 1.0) * 0.3
         | + greatest(0.0, 1.0 - ($punct) * 5) * 0.2
         | + (CASE WHEN $mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
         | + least(($stopRatio) * 4, 1.0) * 0.3""".stripMargin
    /** Quality in integer micro-units — the ONE replay of the Spark
      * side's round-then-floor (TextFunctions.qualityScore rounds to
      * 6dp; flooring the unrounded double instead shifts q_u by one
      * for values within 5e-7 below a micro boundary). Use this, never
      * an inline floor(quality * 1e6). */
    val qualityU = s"CAST(floor(round($quality, 6) * 1e6) AS BIGINT)"
    // coalesce matches Sample.stratifiedPermille's NULL-as-empty-doc
    // addressing (a NULL fp would make the permille predicate NULL and
    // silently drop the row on the oracle side only)
    val fp =
      """list_reduce(list_prepend(CAST(7 AS BIGINT),
        |   list_transform(str_split(coalesce(text, ''), ''), c -> CAST(unicode(c) AS BIGINT))),
        |   (acc, cp) -> (acc * 31 + cp) % 2147483647)""".stripMargin
    /** 8-char-shingle exact-Jaccard pair chain over `documents`,
      * ending in CTE `jpairs(id_a, id_b, jaccard)` with jaccard
      * rounded to 6dp BEFORE any threshold — the one definition shared
      * by the ngram-dedup, minhash (same exact answer) and
      * contamination oracles.
      */
    val pairCtes: String =
      """sh AS (
        | SELECT doc_id, unnest(list_distinct(
        |   list_transform(range(1, greatest(length(text) - 8, -1) + 2),
        |                  i -> substr(text, CAST(i AS INTEGER), 8)))) AS s
        | FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |common AS (
        | SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS c
        | FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        | GROUP BY 1, 2),
        |jpairs AS (
        | SELECT id_a, id_b,
        |  round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
        | FROM common
        | JOIN sz sa ON sa.doc_id = id_a
        | JOIN sz sb ON sb.doc_id = id_b)""".stripMargin

    /** Space-joined token n-grams over a list expression named `ts`. */
    def gramsSql(n: Int): String = {
      val parts = (0 until n).map(k => s"ts[j + $k]").mkString(" || ' ' || ")
      s"list_transform(range(1, len(ts) - ${n - 2}), j -> $parts)"
    }

    /** Duplicate-n-gram fraction over `ts` (0.0 when too short). */
    def dupFracSql(n: Int): String =
      s"""CASE WHEN len(ts) < $n THEN 0.0 ELSE
         | (len(${gramsSql(n)}) - len(list_distinct(${gramsSql(n)})))
         |   / CAST(len(${gramsSql(n)}) AS DOUBLE) END""".stripMargin

    /** Top-token mass fraction over `ts` (0.0 when empty). */
    val topTokenFracSql: String =
      """CASE WHEN len(ts) = 0 THEN 0.0 ELSE
        | list_max(list_transform(list_distinct(ts),
        |   u -> len(list_filter(ts, x -> x = u))))
        |   / CAST(len(ts) AS DOUBLE) END""".stripMargin

    def langScore(lang: String): String =
      TextFunctions.langMarkers(lang)
        .map(w => s"len(list_filter($lowToks, t -> t = '$w'))")
        .mkString(" + ")
    val langs: Seq[String] = TextFunctions.langMarkers.keys.toSeq.sorted
    val langScores: String =
      langs.map(l => s"(${langScore(l)}) AS s_$l").mkString(", ")
    val langMax: String = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val langPick: String = langs
      .map(l => s"WHEN s_$l = $langMax THEN '$l'")
      .mkString("CASE ", " ", " END")

    /** shingles → sizes → common counts → J ≥ 0.9 pairs → symmetric
      * edges → recursive reachability → min-label components, over
      * source CTE/table `src` (8-char shingles). Ends with the `comp`
      * CTE; append a final SELECT against `src`.
      */
    def canonicalCtes(src: String): String =
      s"""sh AS (
         | SELECT doc_id, unnest(list_distinct(
         |   list_transform(range(1, greatest(length(text) - 8, -1) + 2),
         |                  i -> substr(text, CAST(i AS INTEGER), 8)))) AS s
         | FROM $src),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |common AS (
         | SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS c
         | FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         | GROUP BY 1, 2),
         |pairs AS (
         | SELECT id_a, id_b FROM common
         | JOIN sz sa ON sa.doc_id = id_a
         | JOIN sz sb ON sb.doc_id = id_b
         | WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, label) AS (
         | SELECT id, id FROM nodes
         | UNION
         | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
         |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY 1)""".stripMargin
  }

  // -------------------------------------------------------------------
  // Token counting, quality scoring, fingerprinting — all map-side
  // Column expressions inside the parquet scan stage.
  // -------------------------------------------------------------------
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
    val text = col("text")
    docs.select(
      col("doc_id"),
      TextFunctions.tokenCount(text).as("n_tokens"),
      TextFunctions.bpeishTokenCount(text).as("n_bpeish"),
      TextFunctions.charCount(text).as("n_chars_m"),
      floor(TextFunctions.punctRatio(text) * 1e6).cast("long").as("punct_u"),
      floor(TextFunctions.stopwordRatio(text) * 1e6).cast("long").as("stop_u"),
      floor(TextFunctions.meanWordLength(text) * 1e6).cast("long").as("mwl_u"),
      floor(TextFunctions.qualityScore(text) * 1e6).cast("long").as("quality_u"),
      // NULL-as-empty content addressing, matching Sample/dataset_split
      FingerprintExpr.fingerprint(coalesce(text, lit(""))).as("fp"))
      .orderBy("doc_id")
  }

  /** DuckDB replica. Spark `\\w` == RE2 `\\w` (ASCII word chars);
    * `\\p{Punct}` == POSIX [[:punct:]] on ASCII text. Ratios flow
    * through floor(x*1e6) so engine-identical doubles compare exactly.
    */
  val textQualitySql: String =
    // Frag.rt is a regex trim (NOT duckdb trim(), which strips spaces
    // only) — mirrors TextFunctions.tokenCount exactly
    s"""SELECT doc_id,
       | ${Frag.nTok} AS n_tokens,
       | len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpeish,
       | length(text) AS n_chars_m,
       | CAST(floor((${Frag.punct}) * 1e6) AS BIGINT) AS punct_u,
       | CAST(floor((${Frag.stopRatio}) * 1e6) AS BIGINT) AS stop_u,
       | CAST(floor((${Frag.mwl}) * 1e6) AS BIGINT) AS mwl_u,
       | ${Frag.qualityU} AS quality_u,
       | ${Frag.fp} AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // Language-ID by stopword evidence (argmax over marker scores, ties →
  // alphabetical-first).
  // -------------------------------------------------------------------
  def langId(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  val langIdSql: String = // langs sorted: de, en, es, fr
    s"""SELECT doc_id, ${Frag.langPick} AS lang_pred
       |FROM (SELECT doc_id, ${Frag.langScores} FROM documents)
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // METADATA-DRIVEN curation: per-language quality/repetition
  // thresholds come from a POLICY TABLE, not code — the reference's
  // defining idiom (its whole pipeline is driven by control-plane
  // tables, commons/utilities.py) applied to corpus hygiene. A
  // language with no policy row is dropped (explicit allow-list).
  // Thresholds are integer micro-units so the gate compares longs,
  // never floats; the policy side is broadcast (it is metadata-sized
  // by definition), the corpus is gated map-side, and the only
  // shuffle is the per-language report aggregate.
  // -------------------------------------------------------------------
  def curatePolicy(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    import spark.implicits._
    val policy = Seq(
      ("en", 700000L, 300000L),
      ("de", 600000L, 350000L),
      ("fr", 650000L, 350000L)).toDF("lang", "min_q_u", "max_dup3_u")
    val docs = graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
    val scored = docs.select(col("doc_id"),
      TextFunctions.langId(col("text")).as("lang"),
      floor(qualityScore(col("text")) * 1e6).cast("long").as("q_u"),
      floor(dupNgramFraction(col("text"), 3) * 1e6).cast("long")
        .as("dup3_u"),
      tokenCount(col("text")).cast("long").as("toks"))
    scored.join(broadcast(policy), Seq("lang"), "left")
      .withColumn("keep", col("min_q_u").isNotNull &&
        col("q_u") >= col("min_q_u") && col("dup3_u") <= col("max_dup3_u"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("toks")).otherwise(0L)).as("kept_tokens"))
      .orderBy("lang")
  }

  val curatePolicySql: String =
    s"""WITH p(lang, min_q_u, max_dup3_u) AS (VALUES
       |  ('en', 700000, 300000), ('de', 600000, 350000),
       |  ('fr', 650000, 350000)),
       |d AS (SELECT doc_id, ${Frag.langPick} AS lang,
       |  ${Frag.qualityU} AS q_u,
       |  CAST(floor(dup3 * 1e6) AS BIGINT) AS dup3_u,
       |  CAST(n_tok AS BIGINT) AS toks
       | FROM (SELECT doc_id, ${Frag.langScores}, text,
       |         ${Frag.dupFracSql(3)} AS dup3,
       |         ${Frag.nTok} AS n_tok
       |       FROM (SELECT doc_id, text,
       |               CASE WHEN ${Frag.rt} = '' THEN []
       |                    ELSE ${Frag.toks} END AS ts
       |             FROM documents))),
       |g AS (SELECT d.lang, d.toks,
       |  (p.lang IS NOT NULL AND d.q_u >= p.min_q_u
       |   AND d.dup3_u <= p.max_dup3_u) AS keep
       | FROM d LEFT JOIN p ON p.lang = d.lang)
       |SELECT lang, count(*) AS n_docs,
       | CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       | CAST(sum(CASE WHEN keep THEN toks ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM g GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------------------
  // EXACT-QUOTA stratified split: each source contributes exactly
  // n_source div 10 documents to the val split — the hash-permille
  // gate (dataset_split) gives expected proportions; this gives exact
  // ones, which eval-set curation often demands. Selection is the
  // quota-many docs with smallest (fingerprint, doc_id) per source:
  // content-addressed, so re-runs and re-partitionings cannot move a
  // doc between splits, and byte-identical dups sort adjacently. The
  // per-source ranking is a window over (source); at 100 TB per-source
  // volumes, swap in the two-phase global-rank decomposition
  // (Profile.equidepth's coarse-bucket + broadcast-offset pattern) —
  // semantics identical, which is exactly what this oracle row pins.
  // -------------------------------------------------------------------
  def splitQuota(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("source"),
        FingerprintExpr.fingerprint(coalesce(col("text"), lit("")))
          .as("fp"))
    val w = Window.partitionBy("source")
      .orderBy(col("fp").asc, col("doc_id").asc)
    val quotas = docs.groupBy("source")
      .agg(expr("count(1) div 10").as("q"))
    docs.withColumn("rn", row_number().over(w))
      .join(broadcast(quotas), "source")
      .withColumn("is_val", col("rn") <= col("q"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_val"), 1L).otherwise(0L)).as("n_val"),
        sum(when(col("is_val"), col("doc_id")).otherwise(0L))
          .as("val_id_sum"))
      .orderBy("source")
  }

  val splitQuotaSql: String =
    s"""WITH d AS (SELECT doc_id, source, ${Frag.fp} AS fp FROM documents),
       |r AS (SELECT doc_id, source, fp,
       |  row_number() OVER (PARTITION BY source
       |    ORDER BY fp ASC, doc_id ASC) AS rn
       | FROM d),
       |q AS (SELECT source, count(1) // 10 AS q FROM d GROUP BY 1)
       |SELECT r.source AS source, count(*) AS n_docs,
       | CAST(sum(CASE WHEN rn <= q.q THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
       | CAST(sum(CASE WHEN rn <= q.q THEN doc_id ELSE 0 END) AS BIGINT)
       |   AS val_id_sum
       |FROM r JOIN q ON q.source = r.source
       |GROUP BY 1 ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // Deterministic stratified sampling (operators.Sample): downsample
  // the dominant language to 250‰ by content fingerprint, keep the
  // rest whole — corpus rebalancing with zero RNG. The oracle replays
  // langPick + fingerprint + the permille gate, so the exact membership
  // of the sample (not just its size) is under the hash compare.
  // -------------------------------------------------------------------
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("text"),
        TextFunctions.langId(col("text")).as("lang"))
    graft.operators.Sample
      .stratifiedPermille(docs, col("lang"), col("text"),
        ratesPermille = Map("en" -> 250), defaultPermille = 1000)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("lang")
  }

  val sampleStratifiedSql: String =
    s"""WITH tagged AS (
       | SELECT doc_id, text, ${Frag.langPick} AS lang,
       |        ${Frag.fp} AS fp, CAST(${Frag.nTok} AS BIGINT) AS toks
       | FROM (SELECT doc_id, text, ${Frag.langScores} FROM documents))
       |SELECT lang, count(*) AS n_docs,
       | CAST(sum(toks) AS BIGINT) AS n_tokens,
       | min(doc_id) AS first_doc
       |FROM tagged
       |WHERE fp % 1000 < CASE WHEN lang = 'en' THEN 250 ELSE 1000 END
       |GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------------------
  // Temperature-flattened corpus mixing (Sample.temperatureMix):
  // per-source keep rates ∝ n^0.5 / n toward a 500-doc target, applied
  // through the content-addressed permille gate. α = 0.5 is
  // deliberately sqrt (IEEE correctly-rounded in both engines — a
  // libm pow could differ by an ULP and flip a floor at a rate
  // boundary), and the share denominator folds per-source weights in
  // SORTED source order on both sides (double addition is
  // order-sensitive; the oracle uses DuckDB's ordered aggregate).
  // The compare covers the rate DERIVATION and the exact sample
  // membership per source.
  // -------------------------------------------------------------------
  def temperatureMixQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val (sampled, rates) = graft.operators.Sample
      .temperatureMix(docs, "source", col("text"), alpha = 0.5,
        targetTotal = 500L)
    val kept = sampled.groupBy("source").agg(count(lit(1)).as("__kn"))
    val rateCol = rates.foldLeft(lit(0)) { case (acc, (s, r)) =>
      when(col("source") === s, lit(r)).otherwise(acc)
    }
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        rateCol.cast("long").as("rate"),
        coalesce(col("__kn"), lit(0L)).as("n_kept"))
      .orderBy("source")
  }

  val temperatureMixSql: String =
    s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       |           FROM documents GROUP BY 1),
       |tot AS (SELECT sum(sqrt(CAST(n AS DOUBLE)) ORDER BY source) AS s
       |        FROM c),
       |r AS (SELECT source, n,
       |  CAST(least(1000, floor(
       |    1000.0 * 500 * sqrt(CAST(n AS DOUBLE)) / s / CAST(n AS DOUBLE)))
       |    AS BIGINT) AS rate
       |  FROM c CROSS JOIN tot),
       |k AS (SELECT d.source, count(*) AS kn
       |  FROM documents d JOIN r ON d.source = r.source
       |  WHERE ${Frag.fp} % 1000 < r.rate
       |  GROUP BY d.source)
       |SELECT r.source, r.n AS n_docs, r.rate,
       | CAST(coalesce(k.kn, 0) AS BIGINT) AS n_kept
       |FROM r LEFT JOIN k ON k.source = r.source
       |ORDER BY r.source""".stripMargin

  // -------------------------------------------------------------------
  // Exact n-gram Jaccard near-dup pairs (shingle-inverted-index join;
  // shuffle key = shingle). Expected: the 25 planted pairs.
  // -------------------------------------------------------------------
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(
      Tables.load(spark, dir, "documents"),
      idCol = "doc_id", textCol = "text", shingleSize = 8, threshold = 0.9)
      .withColumn("jaccard_u", floor(col("jaccard") * 1e4).cast("long"))
      .drop("jaccard")
      .orderBy("id_a", "id_b")

  val dedupNgramJaccardSql: String =
    s"""WITH ${Frag.pairCtes}
       |SELECT id_a, id_b, CAST(floor(jaccard * 1e4) AS BIGINT) AS jaccard_u
       |FROM jpairs WHERE jaccard >= 0.9
       |ORDER BY id_a, id_b""".stripMargin

  // -------------------------------------------------------------------
  // MinHash+LSH near-dup pairs — the scale path (signature map-side,
  // shuffle only on (band, bucket)). Oracle = the exact-Jaccard pairs:
  // the verification stage gives precision 1.0, and with 32 hashes in
  // 8 bands of 4 a true pair at J escapes every band with
  // P=(1-J⁴)⁸ — ≈6e-12 at the planted J≈0.99 and ≈2e-4 even at the
  // J=0.9 threshold boundary — so the exact answer is also the
  // expected LSH answer. Generator assumption (documented because the
  // oracle is exact while LSH is probabilistic): the testdata plants
  // near-dup pairs at J≈0.99 and keeps all other pairs below 0.1; a
  // generator change planting pairs AT the 0.9 boundary would make
  // this hash-exact compare hold only with P≈(1-2e-4)^pairs.
  // -------------------------------------------------------------------
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(
      Tables.load(spark, dir, "documents"),
      idCol = "doc_id", textCol = "text",
      shingleSize = 8, numHashes = 32, bands = 8, threshold = 0.9)
      .withColumn("jaccard_u", floor(col("jaccard") * 1e4).cast("long"))
      .drop("jaccard")
      .orderBy("id_a", "id_b")

  // -------------------------------------------------------------------
  // INCREMENTAL near-dup against a persisted signature index — the
  // daily-ingest shape: the corpus (doc_id % 5 != 0) is known only
  // through its (id, band, bucket) minhash index, persisted to parquet
  // and read back; the batch (doc_id % 5 == 0) is shingled fresh and
  // probed against it. Oracle = the exact-Jaccard pair set RESTRICTED
  // to pairs with at least one side in the batch — corpus-internal
  // pairs must NOT reappear (they were emitted when their own batch
  // landed), and cross pairs must all surface even though the corpus
  // text is only touched for colliding candidates. Same banding
  // parameters (and therefore the same ~1-6e-12 escape probability on
  // planted pairs) as dedup_minhash_lsh above. The property identity
  // "incremental == one-shot restricted to batch" is pinned
  // deterministically in DedupSpec; this row pins it against the
  // exact-SQL ground truth at the gate SF.
  // -------------------------------------------------------------------
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val batch = docs.where(col("doc_id") % 5 === 0)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_dedup_idx").toString + "/index"
    Dedup.minhashIndex(corpus, "doc_id", "text",
      shingleSize = 8, numHashes = 32, bands = 8)
      .write.parquet(idxPath)
    Dedup.minhashIncrementalPairs(
      corpus, spark.read.parquet(idxPath), batch,
      idCol = "doc_id", textCol = "text",
      shingleSize = 8, numHashes = 32, bands = 8, threshold = 0.9)
      .withColumn("jaccard_u", floor(col("jaccard") * 1e4).cast("long"))
      .drop("jaccard")
      .orderBy("id_a", "id_b")
  }

  val dedupIncrementalSql: String =
    s"""WITH ${Frag.pairCtes}
       |SELECT id_a, id_b, CAST(floor(jaccard * 1e4) AS BIGINT) AS jaccard_u
       |FROM jpairs
       |WHERE jaccard >= 0.9 AND (id_a % 5 = 0 OR id_b % 5 = 0)
       |ORDER BY id_a, id_b""".stripMargin

  // -------------------------------------------------------------------
  // SimHash-blocked near-dup detection with an LSH recall backstop —
  // the production shape: SimHash as the cheap first blocker (64-bit
  // signature, banded self-join, hamming ≤ 6 gate; 8 bands of 8 bits
  // give pigeonhole-GUARANTEED candidate recall for hamming ≤ 7), and
  // MinHash-LSH as the recall backstop for the pairs 64-bit hamming no
  // longer separates — on real corpora some J ≥ 0.9 pairs measure
  // hamming well above any cheap gate (the regenerated sf0.1 data
  // plants pairs at hamming 11), so a simhash-only blocker is a
  // data-dependent recall bet. The UNION of both candidate sets goes
  // through one exact n-gram Jaccard verify, so precision is exact by
  // construction and the oracle identity "= all J ≥ 0.9 pairs" holds
  // at every SF (LSH at 32 hashes / 8 bands misses a J≈0.99 planted
  // pair with P≈6e-12). Only candidate docs get shingled — both
  // blockers shuffle on band buckets, never all-pairs, and the verify
  // stage is proportional to candidates, not corpus.
  // -------------------------------------------------------------------
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val simhashCands = Dedup.simhashPairs(
      docs, idCol = "doc_id", textCol = "text", maxHamming = 6, bands = 8)
      .select("id_a", "id_b")
    val lshCands = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 8, numHashes = 32, bands = 8, threshold = 0.9)
      .select("id_a", "id_b")
    Dedup.verifyJaccard(docs,
      simhashCands.unionByName(lshCands).distinct(),
      idCol = "doc_id", textCol = "text", shingleSize = 8, threshold = 0.9)
      .withColumn("jaccard_u", floor(col("jaccard") * 1e4).cast("long"))
      .drop("jaccard")
      .orderBy("id_a", "id_b")
  }

  // -------------------------------------------------------------------
  // End-to-end dedup: exact near-dup pairs → connected components →
  // one canonical doc per cluster. The oracle replays min-label
  // propagation with a recursive CTE (components = min reachable id).
  // -------------------------------------------------------------------
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    // candidate pairs via MinHash-LSH — the 100 TB path (no all-pairs
    // stage; shuffle only on band buckets). The exact-Jaccard verify
    // step inside gives precision 1.0, and with 32 hashes / 8 bands a
    // pair at the planted J≈0.99 escapes all bands with P≈6e-12
    // (≈2e-4 even at the 0.9 boundary), so the recursive-CTE oracle
    // over EXACT pairs is still the expected answer. Same generator
    // assumption as dedup_minhash_lsh above: planted pairs sit at
    // J≈0.99, everything else < 0.1 — not at the threshold boundary.
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 8, numHashes = 32, bands = 8, threshold = 0.9)
      .select("id_a", "id_b")
    graft.operators.ConnectedComponents.canonicalize(docs, pairs, "doc_id")
      .select("doc_id")
      .orderBy("doc_id")
  }

  val dedupCanonicalSql: String =
    s"""WITH RECURSIVE ${Frag.canonicalCtes("documents")}
       |SELECT d.doc_id FROM documents d
       |LEFT JOIN comp ON d.doc_id = comp.id
       |WHERE comp.component IS NULL OR comp.component = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // End-to-end corpus CURATION — the composed training-data pipeline:
  // language filter (lang-id argmax) → quality gate (micro-unit
  // threshold, engine-exact doubles) → MinHash-LSH near-dup pairs over
  // the SURVIVORS → connected components → one canonical doc per
  // cluster. Each stage is individually oracle-proven (lang_id,
  // text_quality, dedup_minhash_lsh, dedup_canonical); this row proves
  // the composition. Filters run before the pair stage on purpose —
  // at 100 TB, curation order is the cost model (shingle+hash only
  // what survived the cheap map-side gates).
  // -------------------------------------------------------------------
  def curateCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
    // pinned: the survivor set feeds the minhash signature branch, the
    // Jaccard-verify branch AND the canonicalize scan — unpinned, the
    // lang-id + quality gates (dozens of regex splits per row) re-run
    // per consumer (measured: 33 s → 7 s at sf0.1)
    val kept = graft.operators.Par.pin(docs.select(col("doc_id"), col("text"))
      .where(TextFunctions.langId(col("text")) === "en" &&
        floor(TextFunctions.qualityScore(col("text")) * 1e6).cast("long")
          >= 700000L))
    val pairs = Dedup.minhashLshPairs(kept, "doc_id", "text",
      shingleSize = 8, numHashes = 32, bands = 8, threshold = 0.9)
      .select("id_a", "id_b")
    graft.operators.ConnectedComponents.canonicalize(kept, pairs, "doc_id")
      .select("doc_id")
      .orderBy("doc_id")
  }

  val curateCorpusSql: String =
    s"""WITH RECURSIVE kept AS (
       | SELECT doc_id, text FROM (
       |   SELECT doc_id, text, ${Frag.langPick} AS lang,
       |     ${Frag.qualityU} AS qu
       |   FROM (SELECT doc_id, text, ${Frag.langScores} FROM documents))
       | WHERE lang = 'en' AND qu >= 700000),
       |${Frag.canonicalCtes("kept")}
       |SELECT d.doc_id FROM kept d
       |LEFT JOIN comp ON d.doc_id = comp.id
       |WHERE comp.component IS NULL OR comp.component = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // Vocabulary building: corpus-wide word-bigram counts, top 20 — the
  // counting primitive under tokenizer training. Bigrams are built
  // inside the scan stage with array ops (zip_with over shifted
  // slices — no UDF, no per-token shuffle); the only shuffle is the
  // count aggregation on the bigram key, top-k via a deterministic
  // (count desc, ngram asc) order. At 100 TB this is the canonical
  // map-side-combine shape: partial counts collapse per executor
  // before the single key shuffle.
  // -------------------------------------------------------------------
  def vocabTopNgrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
    val ws = split(trim(lower(col("text"))), "\\s+")
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat_ws(" ", a, b))
    docs.select(explode(bigrams).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(20)
  }

  val vocabTopNgramsSql: String =
    """WITH ws AS (
      | SELECT str_split_regex(trim(lower(text)), '\s+') AS a FROM documents),
      |bg AS (
      | SELECT unnest(list_transform(range(1, len(a)),
      |                              i -> a[i] || ' ' || a[i + 1])) AS ngram
      | FROM ws)
      |SELECT ngram, count(*) AS n FROM bg
      |GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // Deterministic train/val split — hash-based bucketing on the doc
  // FINGERPRINT (content-addressed: re-runs and re-shuffles cannot move
  // a document between splits, and byte-identical dups land in the same
  // split). Pure map-side expression + one agg shuffle; the fingerprint
  // is the codegen'd rolling-hash Expression, replayed relationally by
  // the oracle.
  // -------------------------------------------------------------------
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
    docs.select(
      col("doc_id"),
      // NULL-as-empty: a NULL fp would route the doc to "val" via the
      // otherwise-branch on the Spark side only
      FingerprintExpr.fingerprint(coalesce(col("text"), lit(""))).as("fp"),
      TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
      .withColumn("split",
        when(col("fp") % 100 < 90, lit("train")).otherwise(lit("val")))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("split")
  }

  val datasetSplitSql: String = {
    s"""WITH t AS (SELECT doc_id, ${Frag.fp} AS fp,
       |  CAST(${Frag.nTok} AS BIGINT) AS toks
       | FROM documents)
       |SELECT CASE WHEN fp % 100 < 90 THEN 'train' ELSE 'val' END AS split,
       | count(*) AS n_docs,
       | CAST(sum(toks) AS BIGINT) AS n_tokens,
       | min(doc_id) AS min_doc,
       | max(doc_id) AS max_doc
       |FROM t GROUP BY 1 ORDER BY split""".stripMargin
  }

  // -------------------------------------------------------------------
  // LEAKAGE-FREE train/val split: assignment by NEAR-DUP CLUSTER, not
  // by document. A per-doc hash split (dataset_split) puts two
  // near-duplicates on opposite sides of the train/val fence with
  // probability ~2·p·(1−p) each — test-set contamination by
  // construction. Here the split key is the document's connected-
  // component label (MinHash-LSH pairs → pointer-jumping CC; singleton
  // docs are their own component), so every near-dup cluster lands
  // whole in exactly one split — zero leakage is STRUCTURAL, and the
  // engine require()s it on the candidate pairs. The oracle replays
  // the whole path (shingles → exact-Jaccard pairs → recursive-CTE
  // components → the same deterministic gate) and pins the per-split
  // doc and cluster counts. 100 TB shape: the pair stage is the
  // LSH-bucketed shuffle, CC is O(log diameter) rounds over PAIRS
  // (not docs), and the gate itself is one map-side expression + one
  // agg shuffle.
  // -------------------------------------------------------------------
  def splitLeakFree(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
    val pairs = graft.operators.Par.pin(
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleSize = 8, numHashes = 32, bands = 8, threshold = 0.9)
        .select("id_a", "id_b"))
    val comp = graft.operators.ConnectedComponents.components(pairs)
    val labeled = docs.select(col("doc_id"))
      .join(comp, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("grp"))
    // deterministic 90/10 gate on the GROUP label (Knuth multiplicative
    // scramble — replayable in both engines on int64, no overflow at
    // any realistic doc count)
    val split = labeled.withColumn("split",
      when(pmod(col("grp") * lit(2654435761L), lit(100)) < 90, lit("train"))
        .otherwise(lit("val")))
    // structural-leakage proof: no candidate near-dup pair straddles
    // the fence (same component ⇒ same grp ⇒ same split)
    val sides = split.select(col("doc_id").as("d"), col("split").as("s"))
    val leaks = pairs
      .join(sides.withColumnRenamed("d", "id_a")
        .withColumnRenamed("s", "s_a"), "id_a")
      .join(sides.withColumnRenamed("d", "id_b")
        .withColumnRenamed("s", "s_b"), "id_b")
      .where(col("s_a") =!= col("s_b")).count()
    require(leaks == 0L, s"cluster split leaked $leaks near-dup pairs")
    split.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("grp")).as("n_groups"))
      .orderBy("split")
  }

  val splitLeakFreeSql: String =
    s"""WITH RECURSIVE ${Frag.canonicalCtes("documents")},
       |grp AS (SELECT d.doc_id, coalesce(comp.component, d.doc_id) AS grp
       |        FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
       |s AS (SELECT doc_id, grp,
       |        CASE WHEN (grp * 2654435761) % 100 < 90 THEN 'train'
       |             ELSE 'val' END AS split
       |      FROM grp)
       |SELECT split, count(*) AS n_docs,
       | count(DISTINCT grp) AS n_groups
       |FROM s GROUP BY 1 ORDER BY split""".stripMargin

  // -------------------------------------------------------------------
  // Greedy sequence packing into ~2000-token shards over the global
  // doc_id order — the scalable two-phase prefix sum (Pack.packGreedy):
  // within-bucket window cumsums in parallel + a tiny bucket-offset
  // table broadcast back, never a corpus-wide single-partition window.
  // The oracle replays the semantics with DuckDB's global window — same
  // values, which is exactly the point: the decomposition must be
  // invisible in the result.
  // -------------------------------------------------------------------
  def packShards(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.operators.Par.widen(Tables.load(spark, dir, "documents"))
    val t = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
    graft.operators.Pack
      .packGreedy(t, "doc_id", "toks", shardWeight = 2000L, bucketSize = 100L)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard")
  }

  val packShardsSql: String = {
    s"""WITH t AS (SELECT doc_id, CAST(${Frag.nTok} AS BIGINT) AS toks
       | FROM documents),
       |c AS (SELECT doc_id, toks,
       |  sum(toks) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       | FROM t),
       |s AS (SELECT doc_id, toks,
       |  CAST(CAST(cum - toks AS BIGINT) // 2000 AS BIGINT) AS shard FROM c)
       |SELECT shard, count(*) AS n_docs,
       | CAST(sum(toks) AS BIGINT) AS n_tokens,
       | min(doc_id) AS first_doc,
       | max(doc_id) AS last_doc
       |FROM s GROUP BY shard ORDER BY shard""".stripMargin
  }

  // -------------------------------------------------------------------
  // BPE-style vocabulary induction: N rounds of merge-the-top-pair
  // with recount (operators.Bpe — the iterative extension of
  // vocab_top_ngrams). The oracle UNROLLS the N rounds as a CTE chain:
  // both engines express the greedy merge as a literal
  // replace(' a  b ', ' a b ') over the double-space token encoding,
  // and replace() substitutes non-overlapping matches left-to-right in
  // both — so pair counts, tie-breaks AND merge application replay
  // exactly, round by round.
  // -------------------------------------------------------------------
  val BpeRounds = 3

  def vocabBpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.learnMerges(
      Tables.load(spark, dir, "documents"), "text", nMerges = BpeRounds)

  val vocabBpeMergesSql: String = {
    def round(i: Int, src: String): String =
      s"""p$i AS (
         | SELECT unnest(list_transform(range(1, len(t)),
         |                              j -> {'a': t[j], 'b': t[j + 1]})) AS p
         | FROM (SELECT str_split(trim(enc), '  ') AS t FROM $src)),
         |t$i AS (
         | SELECT p.a AS a, p.b AS b, count(*) AS n FROM p$i
         | GROUP BY 1, 2 ORDER BY n DESC, a ASC, b ASC LIMIT 1)""".stripMargin
    // merged tokens glue their parts with chr(1) — Bpe.Joiner — so the
    // pattern's outer single-space boundaries can only match separator
    // spaces (see Bpe.scala's boundary-collision note)
    def merge(i: Int, src: String): String =
      s"""d${i + 1} AS (
         | SELECT replace(enc, ' ' || a || '  ' || b || ' ',
         |                ' ' || a || chr(1) || b || ' ') AS enc
         | FROM $src CROSS JOIN t$i)""".stripMargin
    val rounds = (1 to BpeRounds).map { i =>
      round(i, s"d$i") +
        (if (i < BpeRounds) ",\n" + merge(i, s"d$i") else "")
    }.mkString(",\n")
    val out = (1 to BpeRounds)
      .map(i => s"SELECT $i AS step, replace(a, chr(1), ' ') AS pair_a, " +
        s"replace(b, chr(1), ' ') AS pair_b, n FROM t$i")
      .mkString("\nUNION ALL ")
    s"""WITH d1 AS (
       | SELECT ' ' || regexp_replace(trim(lower(text)), '[\\s\\x01]+', '  ', 'g')
       |        || ' ' AS enc
       | FROM documents),
       |$rounds
       |$out
       |ORDER BY step""".stripMargin
  }

  // -------------------------------------------------------------------
  // BPE tokenizer APPLICATION (Bpe.applyMerges): learn BpeRounds merges,
  // then encode the corpus in one fused scan (the merge table collects
  // as a vocabulary artifact; each merge is a literal replace in one
  // projection). The oracle replays training AND application: the same
  // round CTEs as vocab_bpe_merges, but with doc_id carried through and
  // the final winner also applied, then the full encoded string and
  // token count compare hash-exact per document.
  // -------------------------------------------------------------------
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val merges = graft.operators.Bpe.learnMerges(docs, "text", BpeRounds)
    graft.operators.Bpe
      .applyMerges(docs.select(col("doc_id"), col("text")), "text", merges)
      .select(col("doc_id"), col("bpe_enc"),
        size(col("bpe_tokens")).as("n_tokens"))
      .orderBy("doc_id")
  }

  val bpeEncodeSql: String = {
    def round(i: Int): String =
      s"""p$i AS (
         | SELECT unnest(list_transform(range(1, len(t)),
         |                              j -> {'a': t[j], 'b': t[j + 1]})) AS p
         | FROM (SELECT str_split(trim(enc), '  ') AS t FROM d$i)),
         |t$i AS (
         | SELECT p.a AS a, p.b AS b, count(*) AS n FROM p$i
         | GROUP BY 1, 2 ORDER BY n DESC, a ASC, b ASC LIMIT 1),
         |d${i + 1} AS (
         | SELECT doc_id, replace(enc, ' ' || a || '  ' || b || ' ',
         |                ' ' || a || chr(1) || b || ' ') AS enc
         | FROM d$i CROSS JOIN t$i)""".stripMargin
    val rounds = (1 to BpeRounds).map(round).mkString(",\n")
    s"""WITH d1 AS (
       | SELECT doc_id,
       |   ' ' || regexp_replace(trim(lower(text)), '[\\s\\x01]+', '  ', 'g')
       |   || ' ' AS enc
       | FROM documents),
       |$rounds
       |SELECT doc_id, enc AS bpe_enc,
       |  CAST(len(str_split(trim(enc), '  ')) AS INTEGER) AS n_tokens
       |FROM d${BpeRounds + 1}
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // Document chunking (TextFunctions.chunkTokens) — context-length prep:
  // overlapping 40-token windows with 8-token overlap, posexploded to
  // one row per chunk. The oracle replays the window arithmetic with
  // DuckDB list slicing; chunk_id + the chunk text + its token count
  // compare hash-exact. Scan-stage flatMap: no shuffle at any scale.
  // -------------------------------------------------------------------
  def chunkDocs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextFunctions.chunkTokens(col("text"), 40, 8)))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        col("col").as("chunk_text"),
        TextFunctions.tokenCount(col("col")).as("chunk_tokens"))
      .orderBy("doc_id", "chunk_id")
  }

  val chunkDocsSql: String =
    """WITH t AS (
      | SELECT doc_id, str_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS ts
      | FROM documents
      | WHERE regexp_replace(text, '^\s+|\s+$', '', 'g') <> ''),
      |n AS (SELECT doc_id, ts, len(ts) AS nt,
      |        1 + CAST(ceil(greatest(0, len(ts) - 40) / 32.0) AS INTEGER)
      |          AS nchunks
      |      FROM t),
      |c AS (SELECT doc_id, unnest(range(0, nchunks)) AS chunk_id, ts FROM n)
      |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
      | list_aggregate(list_slice(ts, chunk_id * 32 + 1, chunk_id * 32 + 40),
      |                'string_agg', ' ') AS chunk_text,
      | CAST(len(list_slice(ts, chunk_id * 32 + 1, chunk_id * 32 + 40))
      |   AS INTEGER) AS chunk_tokens
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // -------------------------------------------------------------------
  // Repetition battery (Gopher-style quality rules): duplicate 2-/3-gram
  // fractions + top-token mass fraction, with the pass flags evaluated
  // on both engines over identical IEEE divisions (same int operands ⇒
  // bit-identical doubles ⇒ the threshold compare cannot flap).
  // -------------------------------------------------------------------
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    Tables.load(spark, dir, "documents").select(
        col("doc_id"),
        dupNgramFraction(col("text"), 2).as("dup2_frac"),
        dupNgramFraction(col("text"), 3).as("dup3_frac"),
        topTokenFraction(col("text")).as("top_token_frac"))
      .withColumn("repetition_pass",
        col("dup3_frac") <= 0.3 && col("top_token_frac") <= 0.2)
      .orderBy("doc_id")
  }

  val textRepetitionSql: String =
    s"""WITH d AS (
       | SELECT doc_id,
       |   CASE WHEN ${Frag.rt} = '' THEN [] ELSE ${Frag.toks} END AS ts
       | FROM documents),
       |m AS (SELECT doc_id,
       |  ${Frag.dupFracSql(2)} AS dup2_frac,
       |  ${Frag.dupFracSql(3)} AS dup3_frac,
       |  ${Frag.topTokenFracSql} AS top_token_frac
       | FROM d)
       |SELECT doc_id, dup2_frac, dup3_frac, top_token_frac,
       | dup3_frac <= 0.3 AND top_token_frac <= 0.2 AS repetition_pass
       |FROM m ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // Cross-source contamination matrix — benchmark-leakage detection:
  // near-duplicate PAIRS (the MinHash-LSH scale path, same parameters
  // and recall argument as dedup_minhash_lsh) rolled up by the SOURCE
  // pair they straddle. Off-diagonal cells are the leaks (an eval set
  // contaminating a train crawl); the diagonal is ordinary
  // within-source duplication. Source pairs are unordered
  // (least/greatest) so A→B and B→A land in one cell.
  // -------------------------------------------------------------------
  def contaminationMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    val pairs = Dedup.minhashLshPairs(docs,
      idCol = "doc_id", textCol = "text",
      shingleSize = 8, numHashes = 32, bands = 8, threshold = 0.9)
    // broadcast the PAIRS (near-dup pairs ≪ corpus); the corpus-sized
    // doc→source map streams from its scan — broadcasting src instead
    // would ship the whole corpus mapping through the driver
    val withA = src.withColumnRenamed("source", "src_a")
      .join(broadcast(pairs), col("doc_id") === col("id_a")).drop("doc_id")
    src.withColumnRenamed("source", "src_b")
      .join(broadcast(withA), col("doc_id") === col("id_b")).drop("doc_id")
      .select(
        least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .groupBy("source_lo", "source_hi")
      .agg(count(lit(1)).as("n_dup_pairs"))
      .orderBy("source_lo", "source_hi")
  }

  val contaminationMatrixSql: String =
    s"""WITH ${Frag.pairCtes},
       |p AS (SELECT id_a, id_b FROM jpairs WHERE jaccard >= 0.9)
       |SELECT least(da.source, db.source) AS source_lo,
       | greatest(da.source, db.source) AS source_hi,
       | count(*) AS n_dup_pairs
       |FROM p
       |JOIN documents da ON da.doc_id = p.id_a
       |JOIN documents db ON db.doc_id = p.id_b
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // Cross-modal quality report — documents and embeddings share the id
  // space (doc_id = vec_id), so text-side quality signals roll up by
  // EMBEDDING-SPACE grouping (the label column): per label, doc count,
  // exact micro-unit quality mass, token mass, and how many docs clear
  // the repetition gate. This is the curation deliverable that decides
  // which semantic clusters need cleaning. One doc_id join (both sides
  // id-partitioned at scale), one tiny group-by.
  // -------------------------------------------------------------------
  def modalQualityByLabel(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val docs = Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      floor(qualityScore(col("text")) * 1e6).cast("long").as("q_u"),
      tokenCount(col("text")).cast("long").as("toks"),
      (dupNgramFraction(col("text"), 3) <= 0.3 &&
        topTokenFraction(col("text")) <= 0.2).as("rep_pass"))
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label"))
    docs.join(emb, "doc_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_docs"),
        sum("q_u").as("quality_u_sum"),
        sum("toks").as("n_tokens"),
        sum(when(col("rep_pass"), 1L).otherwise(0L)).as("n_rep_pass"))
      .orderBy("label")
  }

  val modalQualityByLabelSql: String =
    s"""WITH d AS (
       | SELECT doc_id,
       |   ${Frag.qualityU} AS q_u,
       |   CAST(${Frag.nTok} AS BIGINT) AS toks,
       |   CASE WHEN ${Frag.rt} = '' THEN [] ELSE ${Frag.toks} END AS ts
       | FROM documents),
       |m AS (SELECT doc_id, q_u, toks,
       |   (${Frag.dupFracSql(3)}) <= 0.3 AND
       |   (${Frag.topTokenFracSql}) <= 0.2 AS rep_pass
       | FROM d),
       |e AS (SELECT vec_id AS doc_id, label FROM embeddings)
       |SELECT label, count(*) AS n_docs,
       | CAST(sum(q_u) AS BIGINT) AS quality_u_sum,
       | CAST(sum(toks) AS BIGINT) AS n_tokens,
       | CAST(sum(CASE WHEN rep_pass THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_rep_pass
       |FROM m JOIN e USING (doc_id)
       |GROUP BY label ORDER BY label""".stripMargin

  // -------------------------------------------------------------------
  // Unigram LM commonness scoring (UnigramScore) — the CCNet-style
  // corpus-distribution filter, log-free so the compare is exact: train
  // a top-500 token vocabulary (count desc, token asc cut), then score
  // each document's total vocabulary frequency mass in a scan-stage
  // fold (the vocab rides as a broadcast map literal — zero shuffles in
  // the scoring pass). The oracle retrains the vocabulary and rejoins
  // per token; integer masses compare hash-exact.
  // -------------------------------------------------------------------
  def unigramCommonness(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.UnigramScore
    val docs = Tables.load(spark, dir, "documents")
    val vocab = UnigramScore.collectVocabulary(
      UnigramScore.vocabulary(docs, "text", topK = 500))
    UnigramScore.scoreWith(docs.select(col("doc_id"), col("text")), "text", vocab)
      .select("doc_id", "n_tokens", "common_u")
      .orderBy("doc_id")
  }

  val unigramCommonnessSql: String =
    s"""WITH toks AS (
       | SELECT doc_id, unnest(${Frag.toks}) AS token
       | FROM documents WHERE ${Frag.rt} <> ''),
       |vocab AS (
       | SELECT token, count(*) AS freq FROM toks
       | GROUP BY token ORDER BY freq DESC, token ASC LIMIT 500)
       |SELECT d.doc_id,
       | CAST(${Frag.nTok} AS BIGINT) AS n_tokens,
       | CAST(coalesce((SELECT sum(v.freq)
       |   FROM toks t JOIN vocab v ON v.token = t.token
       |   WHERE t.doc_id = d.doc_id), 0) AS BIGINT) AS common_u
       |FROM documents d
       |ORDER BY d.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // TF-IDF keyword extraction: top-3 terms per document ranked by the
  // integer surrogate tf·N/df (monotone in tf·idf for fixed N — the
  // ln() never reorders a ratio, so ranks are identical and the score
  // stays ENGINE-EXACT integer arithmetic instead of a float log both
  // engines must round identically). Two grouped counts + one window;
  // the df table shuffles on the term, never on the corpus.
  // -------------------------------------------------------------------
  def tfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val d = Par.widen(Tables.load(spark, dir, "documents"))
    val toks = d.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("token"))
    val tf = toks.groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = d.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_u").desc, col("token").asc)
    tf.join(dft, "token")
      .withColumn("score_u",
        expr(s"tf * 1000000L * ${nDocs}L div df"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("token"), col("score_u"))
      .orderBy("doc_id", "rk")
  }

  val tfidfKeywordsSql: String =
    s"""WITH toks AS (
       | SELECT doc_id, unnest(${Frag.toks}) AS token
       | FROM documents WHERE ${Frag.rt} <> ''),
       |tf AS (SELECT doc_id, token, count(*) AS tf
       |       FROM toks GROUP BY doc_id, token),
       |dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       | SELECT tf.doc_id, tf.token,
       |   CAST(tf.tf * 1000000 * n.n_docs // dft.df AS BIGINT) AS score_u,
       |   row_number() OVER (PARTITION BY tf.doc_id
       |     ORDER BY tf.tf * 1000000 * n.n_docs // dft.df DESC,
       |              tf.token ASC) AS rk
       | FROM tf JOIN dft USING (token) CROSS JOIN n)
       |SELECT doc_id, CAST(rk AS BIGINT) AS rk, token, score_u
       |FROM scored WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin

  // -------------------------------------------------------------------
  // Cross-document duplicate SPAN detection — the exact-substring
  // signal of training-data dedup (a doc pair can be far below any
  // whole-doc Jaccard threshold and still share a verbatim 8-token
  // span; span-level dedup catches boilerplate, quotes and templated
  // text that document-level near-dup misses). Relational formulation:
  // positioned token 8-grams → grams seen in >=2 distinct docs → per
  // doc, the duplicated-span starts and the UNION of their token
  // intervals (dup_tokens = how many tokens span-removal would cut).
  // One shuffle on the gram; at 100 TB the gram travels as a 64-bit
  // rolling-hash fingerprint (functions/Fingerprint) instead of the
  // string — here it stays the string so the oracle is exact.
  // -------------------------------------------------------------------
  def dedupSpans(spark: SparkSession, dir: String): DataFrame = {
    val W = 8
    // widen: the doc table is a handful of files — without a spread the
    // whole gram explode runs on that many tasks
    val d = Par.widen(Tables.load(spark, dir, "documents"))
    // the corpus-sized shuffle ships an 8-byte xxhash64 of the gram,
    // not the ~50-byte string; only HASH-duplicated candidates (a tiny
    // fraction) re-group on the full string, so a hash collision can
    // only ADD a candidate that the string-level confirm then rejects
    // — exactness is unconditional, the hash is purely a bandwidth cut
    // NOT pinned: the gram stream is a map-side explode off the doc
    // scan — recomputing it for its two consumers is pure parallel CPU,
    // while checkpointing millions of 50-byte strings is serial I/O
    // that measured SLOWER than the recompute
    val grams = d.select(col("doc_id"),
        posexplode(TextFunctions.wordNgrams(col("text"), W))
          .as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("gram"),
        xxhash64(col("gram")).as("gh"))
    val dupHash = grams.groupBy("gh")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select("gh")
    val cand = grams.join(dupHash, Seq("gh"), "left_semi")
    val dup = cand.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select("gram")
    val dg = Par.pin(cand.join(dup, Seq("gram"), "left_semi")
      .select("doc_id", "pos"))
    val spans = dg.groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
    val cov = dg.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (W - 1))).as("tp"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("dup_tokens"))
    val nt = d.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    nt.join(spans, "doc_id").join(cov, "doc_id").orderBy("doc_id")
  }

  val dedupSpansSql: String = {
    val gram = (0 until 8).map(k => s"ts[j + $k]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       | SELECT doc_id, ${Frag.toks} AS ts
       | FROM documents WHERE ${Frag.rt} <> ''),
       |p AS (SELECT doc_id, ts, unnest(range(1, len(ts) - 6)) AS j
       |      FROM toks WHERE len(ts) >= 8),
       |g AS (SELECT doc_id, j AS pos, $gram AS gram FROM p),
       |dup AS (SELECT gram FROM g GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2),
       |dg AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
       |spans AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans
       |          FROM dg GROUP BY doc_id),
       |cov AS (SELECT doc_id, CAST(count(DISTINCT tp) AS BIGINT) AS dup_tokens
       |        FROM (SELECT doc_id, unnest(range(pos, pos + 8)) AS tp
       |              FROM dg) GROUP BY doc_id),
       |nt AS (SELECT doc_id, CAST(${Frag.nTok} AS BIGINT) AS n_tokens
       |       FROM documents)
       |SELECT n.doc_id, n.n_tokens, s.n_dup_spans, c.dup_tokens
       |FROM nt n JOIN spans s USING (doc_id) JOIN cov c USING (doc_id)
       |ORDER BY n.doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // Exact edit-distance join (operators/FuzzyJoin): deletion-
  // neighborhood blocking generates O(n·len) candidates instead of the
  // O(n²) cross join, then the built-in levenshtein verifies each —
  // recall 1 by the FastSS theorem. Supplier names differ in single
  // digits, so the distance-1 pair set is rich and fully checkable by
  // DuckDB's own levenshtein over the (tiny at sf) all-pairs oracle.
  // -------------------------------------------------------------------
  def fuzzyJoinEdit(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.load(spark, dir, "supplier")
    graft.operators.FuzzyJoin
      .editDistancePairs(s, "s_suppkey", "s_name", maxDist = 1)
      .select(col("s_a").as("s_name_a"), col("s_b").as("s_name_b"),
        col("dist").cast("long").as("dist"))
      .orderBy("s_name_a", "s_name_b")
  }

  val fuzzyJoinEditSql: String =
    """SELECT a.s_name AS s_name_a, b.s_name AS s_name_b,
      |       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
      |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
      |WHERE levenshtein(a.s_name, b.s_name) <= 1
      |ORDER BY s_name_a, s_name_b""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tfidf_keywords" -> (tfidfKeywords _),
    "dedup_spans" -> (dedupSpans _),
    "fuzzy_join_edit" -> (fuzzyJoinEdit _),
    "unigram_commonness" -> (unigramCommonness _),
    "modal_quality_by_label" -> (modalQualityByLabel _),
    "contamination_matrix" -> (contaminationMatrix _),
    "chunk_docs" -> (chunkDocs _),
    "text_repetition" -> (textRepetition _),
    "bpe_encode" -> (bpeEncode _),
    "vocab_bpe_merges" -> (vocabBpeMerges _),
    "sample_stratified" -> (sampleStratified _),
    "temperature_mix" -> (temperatureMixQ _),
    "curate_corpus" -> (curateCorpus _),
    "curate_policy" -> (curatePolicy _),
    "split_quota" -> (splitQuota _),
    "dataset_split" -> (datasetSplit _),
    "split_leak_free" -> (splitLeakFree _),
    "pack_shards" -> (packShards _),
    "vocab_top_ngrams" -> (vocabTopNgrams _),
    "text_quality" -> (textQuality _),
    "lang_id" -> (langId _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_canonical" -> (dedupCanonical _))

  val oracles: Map[String, String] = Map(
    "tfidf_keywords" -> tfidfKeywordsSql,
    "dedup_spans" -> dedupSpansSql,
    "fuzzy_join_edit" -> fuzzyJoinEditSql,
    "unigram_commonness" -> unigramCommonnessSql,
    "modal_quality_by_label" -> modalQualityByLabelSql,
    "contamination_matrix" -> contaminationMatrixSql,
    "chunk_docs" -> chunkDocsSql,
    "text_repetition" -> textRepetitionSql,
    "bpe_encode" -> bpeEncodeSql,
    "vocab_bpe_merges" -> vocabBpeMergesSql,
    "sample_stratified" -> sampleStratifiedSql,
    "temperature_mix" -> temperatureMixSql,
    "curate_corpus" -> curateCorpusSql,
    "curate_policy" -> curatePolicySql,
    "split_quota" -> splitQuotaSql,
    "dataset_split" -> datasetSplitSql,
    "split_leak_free" -> splitLeakFreeSql,
    "pack_shards" -> packShardsSql,
    "vocab_top_ngrams" -> vocabTopNgramsSql,
    "text_quality" -> textQualitySql,
    "lang_id" -> langIdSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_minhash_lsh" -> dedupNgramJaccardSql, // same exact answer — see scaladoc
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_simhash" -> dedupNgramJaccardSql, // blocked+verified ⇒ same exact answer
    "dedup_canonical" -> dedupCanonicalSql)
}
