package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FingerprintExpr, TextFunctions}
import graft.operators.Par

/** Corpus-hygiene wave 2: C4-style boilerplate segment removal,
  * eval-set decontamination by token-n-gram collision, and BM25
  * retrieval — the remaining standard passes of an LLM training-data
  * pipeline over the `documents` table.
  *
  * All three tokenize with TextFunctions.tokens (regex-trimmed
  * whitespace split), replayed in DuckDB by the same
  * `str_split_regex` fragment the QueriesText oracles use.
  */
object QueriesCorpus {

  /** DuckDB fragment: regex-trimmed whitespace tokens of `text`. */
  private val toksSql =
    """str_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')"""

  // -------------------------------------------------------------------
  // C4-style boilerplate removal, segment = 10-token non-overlapping
  // chunk (this corpus has no newlines, so fixed-width segments play
  // the role of C4's lines): any segment occurring in >= 2 distinct
  // documents is boilerplate; documents are reassembled from their
  // surviving segments in order. Emits per-doc segment counts and the
  // md5 of the cleaned text (both engines recompose the exact string).
  //
  // 100 TB shape: segmenting is scan-stage array math. The occurrence
  // count is one partial-agg shuffle on the segment; marking is a join
  // of segments against the counted table on the same key (AQE
  // broadcasts the boilerplate side when — as in every real corpus —
  // the repeated-segment dictionary is small, and its skew-join split
  // handles a hyper-frequent segment). Reassembly is one shuffle on
  // doc_id; the survivor filter rides inside its collect_list (a CASE
  // producing NULL for boilerplate — collect_list drops NULLs), so no
  // extra pass. Nothing collects to the driver.
  // -------------------------------------------------------------------
  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Par.widen(Tables.load(spark, dir, "documents"))
    val seg = docs
      .select(col("doc_id"),
        posexplode(TextFunctions.chunkTokens(col("text"), 10, 0)))
      .withColumnRenamed("col", "seg")
    val cnt = seg.groupBy("seg")
      .agg(countDistinct(col("doc_id")).as("nd"))
    seg.join(cnt, "seg")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_seg"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_removed"),
        md5(concat_ws(" ", expr(
          """transform(array_sort(collect_list(
            |  CASE WHEN nd < 2 THEN struct(pos, seg) END)), x -> x.seg)"""
            .stripMargin))).as("clean_md5"))
      .orderBy("doc_id")
  }

  val boilerplateStripSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS ts FROM documents),
       |seg AS (SELECT doc_id, j AS pos,
       |  array_to_string(ts[(j*10+1):(j*10+10)], ' ') AS seg
       | FROM tok, unnest(range(0, CAST(ceil(len(ts)/10.0) AS BIGINT))) AS u(j)),
       |cnt AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM seg GROUP BY 1)
       |SELECT s.doc_id AS doc_id, count(*) AS n_seg,
       | CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       | md5(coalesce(string_agg(CASE WHEN c.nd < 2 THEN s.seg END, ' '
       |   ORDER BY s.pos), '')) AS clean_md5
       |FROM seg s JOIN cnt c USING (seg)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // Eval-set decontamination (GPT-3-style n-gram collision): the val
  // split (content-addressed fingerprint bucket, same rule as
  // dataset_split) plays the held-out benchmark; a TRAIN document is
  // contaminated when at least half of its distinct 5-token n-grams
  // appear anywhere in the val split. Emits the contaminated train
  // docs with their hit counts — exactly the planted cross-split
  // near-duplicates. The threshold compare is integer (2*hits >= n),
  // so no float boundary can disagree between engines.
  //
  // 100 TB shape: eval suites are tiny by construction, so the val
  // n-gram dictionary is broadcast — the train side is marked entirely
  // map-side and the only corpus-wide shuffle is the per-doc hit
  // aggregation on doc_id. Char-shingles would saturate here (tiny
  // vocab => shared 8-grams everywhere); token n-grams are the
  // published collision unit precisely because they stay sparse.
  // -------------------------------------------------------------------
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Par.widen(Tables.load(spark, dir, "documents"))
    val g = docs
      .select(col("doc_id"),
        (FingerprintExpr.fingerprint(coalesce(col("text"), lit(""))) % 100 < 90)
          .as("is_train"),
        explode(array_distinct(
          TextFunctions.wordNgrams(col("text"), 5))).as("g"))
    val ev = g.filter(!col("is_train")).select("g").distinct()
    g.filter(col("is_train"))
      .join(broadcast(ev.withColumn("hit", lit(1L))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .where(col("n_hits") * 2 >= col("n_grams"))
      .orderBy("doc_id")
  }

  val decontaminateSql: String =
    s"""WITH tok AS (SELECT doc_id,
       |  (list_reduce(list_prepend(CAST(7 AS BIGINT),
       |     list_transform(str_split(coalesce(text, ''), ''),
       |                    c -> CAST(unicode(c) AS BIGINT))),
       |     (acc, cp) -> (acc * 31 + cp) % 2147483647) % 100 < 90) AS is_train,
       |  $toksSql AS ts FROM documents),
       |gr AS (SELECT doc_id, is_train, unnest(list_distinct(
       |   CASE WHEN len(ts) < 5 THEN []
       |   ELSE list_transform(range(1, len(ts) - 3),
       |     j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2] || ' ' ||
       |          ts[j+3] || ' ' || ts[j+4]) END)) AS g
       | FROM tok),
       |ev AS (SELECT DISTINCT g FROM gr WHERE NOT is_train)
       |SELECT doc_id, count(*) AS n_grams,
       | CAST(count(*) FILTER (WHERE g IN (SELECT g FROM ev)) AS BIGINT) AS n_hits
       |FROM gr WHERE is_train GROUP BY 1
       |HAVING CAST(count(*) FILTER (WHERE g IN (SELECT g FROM ev)) AS BIGINT) * 2
       |  >= count(*)
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // BM25 top-k retrieval (Okapi, k1=1.2 b=0.75) for a two-term query —
  // the relevance-scoring primitive of corpus search and RAG recall.
  // Scores are IEEE doubles with an IDENTICAL expression tree in both
  // engines (same association order), rounded to 6dp before the top-k
  // order, with doc_id as the deterministic tiebreak.
  //
  // 100 TB shape: per-doc term frequencies are scan-stage array math;
  // the corpus stats (N, avgdl, per-term df) are a 1-row aggregate
  // broadcast back, so scoring is a second map-only pass — two scans
  // total and zero data-sized shuffles; top-k is Spark's
  // TakeOrdered (per-partition heap + driver merge of k rows). A
  // standing deployment would maintain the stats incrementally
  // (appendIndex pattern, operators/Similarity.scala) to drop scan 1.
  // -------------------------------------------------------------------
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val (t1, t2) = ("spark", "vector")
    val (k1, b) = (1.2, 0.75)
    val docs = Par.widen(Tables.load(spark, dir, "documents"))
    val d = docs.select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("ts"))
      .select(col("doc_id"), size(col("ts")).as("dl"),
        size(expr(s"filter(ts, x -> x = '$t1')")).as("tf1"),
        size(expr(s"filter(ts, x -> x = '$t2')")).as("tf2"))
    val st = Par.pinLocal(d.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
      sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2")))
    def part(tf: String, df: String): String =
      s"""ln(1.0 + (cast(n as double) - cast($df as double) + 0.5)
         |        / (cast($df as double) + 0.5))
         | * (cast($tf as double) * ${k1 + 1})
         | / (cast($tf as double)
         |    + $k1 * (1.0 - $b + $b * cast(dl as double) / avgdl))"""
        .stripMargin
    d.crossJoin(broadcast(st))
      .where(col("tf1") > 0 || col("tf2") > 0)
      .select(col("doc_id"),
        round(expr(s"${part("tf1", "df1")} + ${part("tf2", "df2")}"), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10)
  }

  val bm25TopKSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS ts FROM documents),
       |d AS (SELECT doc_id, len(ts) AS dl,
       |  len(list_filter(ts, x -> x = 'spark')) AS tf1,
       |  len(list_filter(ts, x -> x = 'vector')) AS tf2 FROM tok),
       |st AS (SELECT count(*) AS n,
       |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
       |  sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
       |  sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM d)
       |SELECT doc_id,
       | round(ln(1.0 + (CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
       |               / (CAST(df1 AS DOUBLE) + 0.5))
       |        * (CAST(tf1 AS DOUBLE) * 2.2)
       |        / (CAST(tf1 AS DOUBLE)
       |           + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
       |      + ln(1.0 + (CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
       |               / (CAST(df2 AS DOUBLE) + 0.5))
       |        * (CAST(tf2 AS DOUBLE) * 2.2)
       |        / (CAST(tf2 AS DOUBLE)
       |           + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)),
       |   6) AS score
       |FROM d, st WHERE tf1 > 0 OR tf2 > 0
       |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin

  // -------------------------------------------------------------------
  // Persisted inverted index + conjunctive probe
  // (operators/InvertedIndex.scala): the index is built once (two
  // partial-agg shuffles, posting arrays blocked at 10k entries even
  // for stopwords), then the AND-query is answered from |terms|
  // partition-pruned index buckets — the corpus itself is NEVER
  // rescanned at query time (scan-bytes-proved in InvertedIndexSpec).
  // The oracle recomputes the membership directly from the documents
  // table: index-served answers must be indistinguishable from corpus
  // scans.
  // -------------------------------------------------------------------
  def searchAnd(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.InvertedIndex
    val idx = java.nio.file.Files
      .createTempDirectory("graft_invidx").toString + "/index"
    InvertedIndex.build(
      Par.widen(Tables.load(spark, dir, "documents")),
      "doc_id", "text", idx)
    InvertedIndex.searchAnd(spark, idx, Seq("spark", "vector"))
  }

  val searchAndSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksSql AS ts FROM documents),
       |d AS (SELECT doc_id,
       |  CAST(len(list_filter(ts, x -> x = 'spark')) AS BIGINT) AS tf_0,
       |  CAST(len(list_filter(ts, x -> x = 'vector')) AS BIGINT) AS tf_1
       | FROM tok)
       |SELECT doc_id, tf_0, tf_1 FROM d
       |WHERE tf_0 > 0 AND tf_1 > 0 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // Heavy hitters (tokens above 2% of corpus mass) via sample-then-
  // verify: a content-addressed 1/8 occurrence sample nominates
  // candidates at HALF the scaled threshold (slack 2), then a second
  // pass counts ONLY the candidates exactly and applies the exact
  // integer cut (cnt*50 >= total). Reported counts are exact; the
  // sample can only cost recall, and with ≥4σ of slack at the
  // threshold it deterministically doesn't on this corpus — the same
  // "probabilistic blocker, exact verify, oracle pins recall" contract
  // as the MinHash dedup family.
  //
  // 100 TB shape: phase 1 shuffles an eighth of the occurrence mass
  // (map-side combined); phase 2's shuffle is bounded by candidate
  // occurrences (heavy tokens only). The exact baseline shuffles every
  // distinct token — the win grows with tail cardinality (web-scale
  // n-grams), which is exactly when heavy-hitter queries matter. The
  // corpus-total is a pinned 1-row aggregate; nothing collects.
  // -------------------------------------------------------------------
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Par.widen(Tables.load(spark, dir, "documents"))
    val toks = docs.select(posexplode(
        TextFunctions.tokens(lower(col("text")))).as(Seq("pos", "g")),
        col("doc_id"))
    val total = Par.pinLocal(toks.agg(count(lit(1)).as("total")))
    val cand = toks
      .where(pmod(xxhash64(col("doc_id"), col("pos"), col("g")), lit(8))
        === 0)
      .groupBy("g").agg(count(lit(1)).as("sc"))
      .crossJoin(broadcast(total))
      // est*2 >= total/50  ⇔  sc*8*2*50 >= total
      .where(col("sc") * 800 >= col("total"))
      .select("g")
    toks.join(broadcast(cand), "g")
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * 50 >= col("total"))
      .select(col("g"), col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double"))
          .as("frac"))
      .orderBy("g")
  }

  val heavyHittersSql: String =
    """WITH tok AS (SELECT unnest(str_split_regex(
      |   regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')) AS g
      | FROM documents WHERE regexp_replace(text, '^\s+|\s+$', '', 'g') <> ''),
      |t AS (SELECT count(*) AS total FROM tok),
      |c AS (SELECT g, count(*) AS cnt FROM tok GROUP BY 1)
      |SELECT g, cnt, CAST(cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS frac
      |FROM c, t WHERE cnt * 50 >= t.total ORDER BY g""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "heavy_hitters" -> (heavyHitters _),
    "boilerplate_strip" -> (boilerplateStrip _),
    "decontaminate" -> (decontaminate _),
    "bm25_topk" -> (bm25TopK _),
    "search_and" -> (searchAnd _))

  val oracles: Map[String, String] = Map(
    "heavy_hitters" -> heavyHittersSql,
    "boilerplate_strip" -> boilerplateStripSql,
    "decontaminate" -> decontaminateSql,
    "bm25_topk" -> bm25TopKSql,
    "search_and" -> searchAndSql)
}
