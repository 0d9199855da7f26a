package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{AsOfJoin, Dedup, FactEnrich, KeyMapUpsert, Normalize, SqlRunner}

/** Reference-parity operator queries (SURVEY.md §2.1–2.7) on the test
  * star schema, each paired with DuckDB oracle SQL.
  *
  * Cross-engine determinism conventions (see Queries scaladoc): decimal-
  * routed double sums, integer micro-units (`floor(x*1e6)`) for values
  * that flow through order-dependent arithmetic, `trunc` in DuckDB
  * wherever Spark casts double→int (Spark truncates, DuckDB rounds —
  * SURVEY §7.5.3).
  */
object QueriesCore {
  import Queries.dsum

  // -------------------------------------------------------------------
  // J1: multi-way broadcast fact enrichment (reference:
  // jobs/curated/facts/sales_fact/dl_ct_gosales_sales_fact_01.py:55-73).
  // The fact side never shuffles: both dims broadcast.
  // -------------------------------------------------------------------
  def j1FactEnrich(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    FactEnrich.enrich(li, Seq(
      FactEnrich.Dim(
        Tables.load(spark, dir, "part"),
        keys = Seq("l_partkey" -> "p_partkey"),
        select = Seq("p_brand" -> "p_brand", "p_type" -> "p_type")),
      FactEnrich.Dim(
        Tables.load(spark, dir, "supplier"),
        keys = Seq("l_suppkey" -> "s_suppkey"),
        select = Seq("s_name" -> "s_name"))))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val j1FactEnrichSql: String =
    """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, l.l_quantity,
      | p.p_brand, p.p_type, s.s_name
      |FROM lineitem l
      |LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  // -------------------------------------------------------------------
  // J2+J4+W1: the reference's signature surrogate-key-map upsert
  // (reference: .../dl_ct_gosales_product_lkp_01.py:50-80). Target =
  // nations < 13 pre-keyed; source = all 25 → 12 new keys numbered 13..24.
  // -------------------------------------------------------------------
  def j2KeymapUpsert(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val target = nation.where(col("n_nationkey") < 13)
      .select(col("n_name").as("nat_key"),
        col("n_nationkey").cast("long").as("sur_key"))
    KeyMapUpsert.upsert(
      nation.select(col("n_name").as("nat_key")), target, "nat_key", "sur_key")
      .orderBy("sur_key")
  }

  val j2KeymapUpsertSql: String =
    """WITH tgt AS (SELECT n_name AS nat_key, CAST(n_nationkey AS BIGINT) AS sur_key
      |             FROM nation WHERE n_nationkey < 13),
      |src AS (SELECT DISTINCT n_name AS nat_key FROM nation WHERE n_name IS NOT NULL),
      |new_keys AS (SELECT s.nat_key FROM src s
      |             WHERE lower(s.nat_key) NOT IN (SELECT lower(nat_key) FROM tgt)),
      |mx AS (SELECT coalesce(max(sur_key), 0) AS m FROM tgt)
      |SELECT nat_key, sur_key FROM tgt
      |UNION ALL
      |SELECT n.nat_key, mx.m + row_number() OVER (ORDER BY n.nat_key) AS sur_key
      |FROM new_keys n CROSS JOIN mx
      |ORDER BY sur_key""".stripMargin

  // -------------------------------------------------------------------
  // A1: scalar MAX+COALESCE bootstrap aggregate (reference:
  // .../product_lkp_01.py:76-78) — the empty-filter side exercises the
  // first-run path; crossJoin of 1-row aggregates = BroadcastNestedLoop.
  // -------------------------------------------------------------------
  def a1ScalarMax(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    orders.where(col("o_totalprice") < 0)
      .agg(coalesce(max(col("o_orderkey")), lit(0L)).as("bootstrap_max"))
      .crossJoin(orders.agg(
        max(col("o_orderkey")).as("real_max"),
        count(lit(1)).as("n_orders")))
  }

  val a1ScalarMaxSql: String =
    """SELECT
      | (SELECT coalesce(max(o_orderkey), 0) FROM orders WHERE o_totalprice < 0) AS bootstrap_max,
      | (SELECT max(o_orderkey) FROM orders) AS real_max,
      | (SELECT count(*) FROM orders) AS n_orders""".stripMargin

  // -------------------------------------------------------------------
  // A3: DISTINCT projection (reference: .../method_hlp_01.py:56).
  // -------------------------------------------------------------------
  def a3Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  val a3DistinctSql: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // W1: running sum over ROWS UNBOUNDED PRECEDING (reference:
  // .../product_lkp_01.py:60) — partitioned by user so it scales, unlike
  // the reference's global window (SURVEY §4 known hazard). Values in
  // integer micro-units: exact under any summation order.
  // -------------------------------------------------------------------
  def w1RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 1e6).cast("long").as("value_u"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("running_value_u", sum(col("value_u")).over(w))
      .select("event_id", "user_id", "running_value_u")
      .orderBy("event_id")
  }

  val w1RunningSumSql: String =
    """SELECT event_id, user_id,
      | CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) OVER
      |   (PARTITION BY user_id ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_value_u
      |FROM events ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------------
  // W2+: ranking/offset window family (row_number, rank, dense_rank,
  // lag, lead, ntile) — the full analytic surface the reference's W2
  // gestures at (reference: .../tehsil_hlp_01.sql:5).
  // -------------------------------------------------------------------
  def w2RankFuncs(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      row_number().over(w).as("rn"),
      rank().over(w).as("rk"),
      dense_rank().over(w).as("drk"),
      lag(col("o_orderkey"), 1).over(w).as("prev_key"),
      lead(col("o_orderkey"), 1).over(w).as("next_key"),
      ntile(4).over(w).as("quartile"))
      .where(col("rn") <= 100)
      .orderBy("o_orderstatus", "rn")
  }

  val w2RankFuncsSql: String =
    """SELECT * FROM (
      | SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  row_number() OVER w AS rn,
      |  rank() OVER w AS rk,
      |  dense_rank() OVER w AS drk,
      |  lag(o_orderkey, 1) OVER w AS prev_key,
      |  lead(o_orderkey, 1) OVER w AS next_key,
      |  ntile(4) OVER w AS quartile
      | FROM orders
      | WINDOW w AS (PARTITION BY o_orderstatus
      |              ORDER BY o_totalprice DESC, o_orderkey ASC)
      |) WHERE rn <= 100 ORDER BY o_orderstatus, rn""".stripMargin

  // -------------------------------------------------------------------
  // Semi + anti joins (SURVEY §2.3 J2 idiom, generalized).
  // -------------------------------------------------------------------
  def jSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("active").as("status"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("inactive").as("status"))
    semi.unionByName(anti).orderBy("c_custkey")
  }

  val jSemiAntiSql: String =
    """SELECT c_custkey, 'active' AS status FROM customer
      | WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey, 'inactive' AS status FROM customer
      | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------
  // Full outer join over per-nation aggregates.
  // -------------------------------------------------------------------
  def jFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val supp = Tables.load(spark, dir, "supplier")
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
    cust.as("c").join(supp.as("s"), col("c.nk") === col("s.nk"), "full_outer")
      .select(
        coalesce(col("c.nk"), col("s.nk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  val jFullOuterSql: String =
    """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
      |s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
      |SELECT coalesce(c.nk, s.nk) AS nationkey,
      | coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin

  // -------------------------------------------------------------------
  // R3/R5/R6/R7/R8: normalization + casting + lineage projection
  // (reference: .../sales_fact_01.py:60-71, tehsil_hlp_01.sql:14).
  // DuckDB CAST(double→int) rounds where Spark truncates → trunc() in
  // the oracle (SURVEY §7.5.3).
  // -------------------------------------------------------------------
  def rNormalizeCast(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part").select(
      col("p_partkey"),
      lower(col("p_brand")).as("brand_lower"),
      Normalize.fuzzyKey(col("p_type")).as("type_key"),
      col("p_size").cast("long").as("size_long"),
      col("p_retailprice").cast("int").as("price_int"),
      floor(col("p_retailprice") * 100).cast("long").as("price_cents"),
      lit("gosales").as("source"),
      lit("I").as("oper"),
      lit(42L).as("table_id"))
      .orderBy("p_partkey")

  val rNormalizeCastSql: String =
    """SELECT p_partkey,
      | lower(p_brand) AS brand_lower,
      | lower(replace(trim(p_type), ' ', '')) AS type_key,
      | CAST(p_size AS BIGINT) AS size_long,
      | CAST(trunc(p_retailprice) AS INTEGER) AS price_int,
      | CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
      | 'gosales' AS source, 'I' AS oper, CAST(42 AS BIGINT) AS table_id
      |FROM part ORDER BY p_partkey""".stripMargin

  // -------------------------------------------------------------------
  // R9/R10: date format → parse round-trip + temporal grouping
  // (reference: tl_sm_gosales_overview_01.sql:6 PARSE_DATE).
  // -------------------------------------------------------------------
  def r9DateParse(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(
      date_format(col("ts"), "yyyy-MM-dd").as("d"),
      date_format(to_date(date_format(col("ts"), "yyyy-MM-dd")), "yyyy-MM")
        .as("month"),
      floor(col("value") * 1e6).cast("long").as("value_u"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("d")).as("n_days"),
        sum(col("value_u")).as("sum_value_u"))
      .orderBy("month")
  }

  val r9DateParseSql: String =
    """SELECT strftime(CAST(strftime(ts, '%Y-%m-%d') AS DATE), '%Y-%m') AS month,
      | count(*) AS n_events,
      | count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
      | CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_value_u
      |FROM events GROUP BY 1 ORDER BY month""".stripMargin

  // -------------------------------------------------------------------
  // ROLLUP aggregation with grouping indicators (beyond-reference
  // capability; Catalyst Expand-based, single shuffle).
  // -------------------------------------------------------------------
  def aggRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        grouping(col("n_name")).as("lvl_nation"),
        grouping(col("o_orderstatus")).as("lvl_status"))
      .orderBy(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  val aggRollupSql: String =
    """SELECT n_name, o_orderstatus, count(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
      | GROUPING(n_name) AS lvl_nation, GROUPING(o_orderstatus) AS lvl_status
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP (n_name, o_orderstatus)
      |ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // Aggregate statistics: COUNT DISTINCT + decimal-exact SUM/AVG.
  // -------------------------------------------------------------------
  def aggStats(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .withColumn("avg_price", col("sum_price") / col("n"))
      .orderBy("o_orderstatus")
  }

  val aggStatsSql: String =
    """SELECT o_orderstatus, n, n_cust, sum_price, min_price, max_price,
      | sum_price / n AS avg_price
      |FROM (
      | SELECT o_orderstatus, count(*) AS n, count(DISTINCT o_custkey) AS n_cust,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      | FROM orders GROUP BY 1)
      |ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // Top-k per group (window + filter — Spark pushes the rank filter
  // into the sort via WindowGroupLimit).
  // -------------------------------------------------------------------
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderstatus", "rn")
  }

  val topkPerGroupSql: String =
    """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
      | SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_orderstatus
      |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      | FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderstatus, rn""".stripMargin

  // -------------------------------------------------------------------
  // JSON extraction from a string column (the reference's json→dict
  // pass-through type, SURVEY §1.2, exercised as from-string access).
  // -------------------------------------------------------------------
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // Set operations: INTERSECT / EXCEPT (distinct semantics both engines).
  // -------------------------------------------------------------------
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val f = o.where(col("o_orderstatus") === "F").select("o_custkey")
    val op = o.where(col("o_orderstatus") === "O").select("o_custkey")
    f.intersect(op).select(col("o_custkey"), lit("both").as("bucket"))
      .unionByName(
        f.except(op).select(col("o_custkey"), lit("f_only").as("bucket")))
      .orderBy("o_custkey", "bucket")
  }

  val setOpsSql: String =
    """SELECT o_custkey, 'both' AS bucket FROM
      | (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |UNION ALL
      |SELECT o_custkey, 'f_only' AS bucket FROM
      | (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |ORDER BY o_custkey, bucket""".stripMargin

  // -------------------------------------------------------------------
  // S13: parameterized multi-statement SQL runner (reference:
  // commons/utilities.py:54-86).
  // -------------------------------------------------------------------
  def s13SqlRunner(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")
    SqlRunner.run(spark,
      """SELECT 1;
        |SELECT c_mktsegment AS segment, count(*) AS n_cust,
        | '{batch_id}' AS batch_id
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      Map("batch_id" -> "b42", "env" -> "dev"))
  }

  val s13SqlRunnerSql: String =
    """SELECT c_mktsegment AS segment, count(*) AS n_cust, 'b42' AS batch_id
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // -------------------------------------------------------------------
  // As-of join: each purchase event picks up the latest prior click's
  // value per user (union-and-carry-forward — ONE shuffle, no range
  // blow-up; DuckDB oracles it with native ASOF JOIN).
  // -------------------------------------------------------------------
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * 1e6).cast("long").as("value_u"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("value_u").as("click_value_u"))
    AsOfJoin.asof(purchases, clicks,
      keyCol = "user_id", leftTime = "ts_us", rightTime = "ts_us",
      valueCols = Seq("click_value_u"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
      |            CAST(floor(value * 1e6) AS BIGINT) AS value_u FROM events),
      |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts_us, value_u AS click_value_u FROM e WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts_us, c.click_value_u
      |FROM p ASOF LEFT JOIN c
      | ON p.user_id = c.user_id AND c.ts_us <= p.ts_us
      |ORDER BY p.event_id""".stripMargin

  // -------------------------------------------------------------------
  // Pivot aggregation (wide reshape; absent combos coalesce to 0 to
  // match COUNT FILTER semantics).
  // -------------------------------------------------------------------
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  val pivotAggSql: String =
    """SELECT o_orderpriority,
      | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      | count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      | count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // Exact dedup: keep min-linenumber row per order (one hash shuffle,
  // no window sort — Dedup.exact).
  // -------------------------------------------------------------------
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      key = col("l_orderkey"), idCol = "l_linenumber")
      .orderBy("l_orderkey")

  val dedupExactSql: String =
    """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, l.l_returnflag
      |FROM lineitem l
      |JOIN (SELECT l_orderkey, min(l_linenumber) AS mn
      |      FROM lineitem GROUP BY 1) m
      |  ON l.l_orderkey = m.l_orderkey AND l.l_linenumber = m.mn
      |ORDER BY l.l_orderkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_fact_enrich" -> (j1FactEnrich _),
    "j2_keymap_upsert" -> (j2KeymapUpsert _),
    "a1_scalar_max" -> (a1ScalarMax _),
    "a3_distinct" -> (a3Distinct _),
    "w1_running_sum" -> (w1RunningSum _),
    "w2_rank_funcs" -> (w2RankFuncs _),
    "j_semi_anti" -> (jSemiAnti _),
    "j_full_outer" -> (jFullOuter _),
    "r_normalize_cast" -> (rNormalizeCast _),
    "r9_date_parse" -> (r9DateParse _),
    "agg_rollup" -> (aggRollup _),
    "agg_stats" -> (aggStats _),
    "topk_per_group" -> (topkPerGroup _),
    "json_extract" -> (jsonExtract _),
    "set_ops" -> (setOps _),
    "s13_sql_runner" -> (s13SqlRunner _),
    "asof_join" -> (asofJoin _),
    "pivot_agg" -> (pivotAgg _),
    "dedup_exact" -> (dedupExact _))

  val oracles: Map[String, String] = Map(
    "j1_fact_enrich" -> j1FactEnrichSql,
    "j2_keymap_upsert" -> j2KeymapUpsertSql,
    "a1_scalar_max" -> a1ScalarMaxSql,
    "a3_distinct" -> a3DistinctSql,
    "w1_running_sum" -> w1RunningSumSql,
    "w2_rank_funcs" -> w2RankFuncsSql,
    "j_semi_anti" -> jSemiAntiSql,
    "j_full_outer" -> jFullOuterSql,
    "r_normalize_cast" -> rNormalizeCastSql,
    "r9_date_parse" -> r9DateParseSql,
    "agg_rollup" -> aggRollupSql,
    "agg_stats" -> aggStatsSql,
    "topk_per_group" -> topkPerGroupSql,
    "json_extract" -> jsonExtractSql,
    "set_ops" -> setOpsSql,
    "s13_sql_runner" -> s13SqlRunnerSql,
    "asof_join" -> asofJoinSql,
    "pivot_agg" -> pivotAggSql,
    "dedup_exact" -> dedupExactSql)
}
