package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave operator coverage: multi-join analytics, cube, exact
  * percentiles, RANGE window frames, the scalar string-function surface,
  * array aggregation, batch sessionization, correlated subqueries.
  */
object QueriesExtra {
  import Queries.dsum

  // -------------------------------------------------------------------
  // TPC-H-Q5-like star join: revenue per nation (joins across 5 tables,
  // dims broadcast, single agg shuffle).
  // -------------------------------------------------------------------
  def tpchRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val tpchRevenueSql: String =
    """SELECT r_name, n_name,
      | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // -------------------------------------------------------------------
  // CUBE aggregation (all 4 grouping combinations in one Expand pass).
  // -------------------------------------------------------------------
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_prio"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val aggCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      | GROUPING(o_orderstatus) AS g_status, GROUPING(o_orderpriority) AS g_prio
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // Exact percentiles / median over integer cents (sort-based exact
  // percentile; interpolation on identical ints is engine-identical).
  // -------------------------------------------------------------------
  def aggPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_orderstatus")
      .agg(
        floor(expr("percentile(cents, 0.5)")).cast("long").as("p50_floor"),
        floor(expr("percentile(cents, 0.9)")).cast("long").as("p90_floor"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  val aggPercentileSql: String =
    """SELECT o_orderstatus,
      | CAST(floor(quantile_cont(cents, 0.5)) AS BIGINT) AS p50_floor,
      | CAST(floor(quantile_cont(cents, 0.9)) AS BIGINT) AS p90_floor,
      | count(*) AS n
      |FROM (SELECT o_orderstatus, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |      FROM orders)
      |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // RANGE window frame (value-based, not row-based): per status, count
  // of orders whose key falls within 1000 before the current key.
  // -------------------------------------------------------------------
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
      .rangeBetween(-1000L, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("n_near", count(lit(1)).over(w))
      .withColumn("sum_near_cents", sum(col("cents")).over(w))
      .orderBy("o_orderkey")
  }

  val windowRangeFrameSql: String =
    """SELECT o_orderkey, o_orderstatus, cents,
      | count(*) OVER w AS n_near,
      | CAST(sum(cents) OVER w AS BIGINT) AS sum_near_cents
      |FROM (SELECT o_orderkey, o_orderstatus,
      |        CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
      |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // Scalar string-function surface (§2.7 parity breadth).
  // -------------------------------------------------------------------
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_upper"),
      lpad(col("p_brand"), 12, "*").as("brand_pad"),
      substring(col("p_name"), 1, 10).as("name_prefix"),
      regexp_extract(col("p_type"), "^([a-zA-Z]+)", 1).as("type_head"),
      regexp_replace(col("p_type"), " ", "_").as("type_snake"),
      length(col("p_name")).as("name_len"),
      reverse(col("p_brand")).as("brand_rev"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  val stringFuncsSql: String =
    """SELECT p_partkey,
      | upper(p_brand) AS brand_upper,
      | lpad(p_brand, 12, '*') AS brand_pad,
      | substr(p_name, 1, 10) AS name_prefix,
      | coalesce(regexp_extract(p_type, '^([a-zA-Z]+)', 1), '') AS type_head,
      | replace(p_type, ' ', '_') AS type_snake,
      | length(p_name) AS name_len,
      | reverse(p_brand) AS brand_rev,
      | concat_ws('|', p_brand, p_type) AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  // -------------------------------------------------------------------
  // Array aggregation: collect + dedupe + sort + join (deterministic
  // string output so the comparison is order-stable).
  // -------------------------------------------------------------------
  def arrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
          .as("segments"),
        count(lit(1)).as("n_cust"))
      .orderBy("c_nationkey")

  val arrayAggSql: String =
    """SELECT c_nationkey,
      | array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
      | count(*) AS n_cust
      |FROM customer GROUP BY 1 ORDER BY c_nationkey""".stripMargin

  // -------------------------------------------------------------------
  // Batch sessionization via lag + cumulative sum (30-minute gap) — the
  // batch twin of streaming/StreamOps.sessionAgg.
  // -------------------------------------------------------------------
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val sessions = ev
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(wOrd) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
      .orderBy("user_id", "session_id")
  }

  // -------------------------------------------------------------------
  // Range join (no equi-key): events (points on the time axis) against
  // 7-day order windows, via the grid-bucketed RangeJoin operator — a
  // plain cell equi-join instead of the BroadcastNestedLoop/cartesian
  // Spark would plan for a bare inequality join. Orders are sampled 1%
  // (o_orderkey % 100 = 0) to keep the match cardinality honest for a
  // bench battery; the operator shape is sample-independent. The
  // aggregate output makes the oracle compare stable while every
  // matched pair contributes (count + value micro-unit sum + distinct
  // interval count).
  // -------------------------------------------------------------------
  def rangeJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val points = Tables.load(spark, dir, "events")
      .select(unix_micros(col("ts")).as("t"),
        col("event_type"), col("value"))
    val intervals = Tables.load(spark, dir, "orders")
      .where(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey").as("iid"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("w_start"))
      .withColumn("w_end", col("w_start") + lit(weekUs))
    graft.operators.RangeJoin
      .pointInInterval(points, "t", intervals, "w_start", "w_end",
        bucketWidth = weekUs)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hits"),
        sum(floor(col("value") * 100).cast("long")).as("val_cents"),
        countDistinct(col("iid")).as("n_intervals"))
      .orderBy("event_type")
  }

  val rangeJoinEventsSql: String =
    """SELECT e.event_type,
      | CAST(count(*) AS BIGINT) AS n_hits,
      | CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT) AS val_cents,
      | CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_intervals
      |FROM events e JOIN orders o
      | ON o.o_orderkey % 100 = 0
      | AND epoch_us(e.ts) >= epoch_us(o.o_orderdate)
      | AND epoch_us(e.ts) <= epoch_us(o.o_orderdate) + 604800000000
      |GROUP BY 1 ORDER BY e.event_type""".stripMargin

  val sessionizeBatchSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |tagged AS (
      | SELECT user_id, event_id, ts_us,
      |  CASE WHEN ts_us - lag(ts_us, 1) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
      | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      | SELECT user_id, ts_us,
      |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM tagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      | max(ts_us) - min(ts_us) AS dur_us
      |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin

  // -------------------------------------------------------------------
  // Correlated scalar subquery + IN subquery (Catalyst decorrelation).
  // -------------------------------------------------------------------
  def subqueries(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders)
        |SELECT o_orderkey FROM o a
        |WHERE a.cents * 1.0 >
        |   1.5 * (SELECT sum(b.cents) * 1.0 / count(*) FROM o b
        |          WHERE b.o_custkey = a.o_custkey)
        |  AND a.o_custkey IN (SELECT c_custkey FROM customer
        |                      WHERE c_mktsegment <> 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin)
  }

  val subqueriesSql: String =
    """WITH o AS (SELECT o_orderkey, o_custkey,
      |             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders)
      |SELECT o_orderkey FROM o a
      |WHERE a.cents * 1.0 >
      |   1.5 * (SELECT sum(b.cents) * 1.0 / count(*) FROM o b
      |          WHERE b.o_custkey = a.o_custkey)
      |  AND a.o_custkey IN (SELECT c_custkey FROM customer
      |                      WHERE c_mktsegment <> 'BUILDING')
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // Salted skew join — result must be IDENTICAL to the plain join (the
  // oracle is the unsalted join), while spreading the hottest key over
  // `factor` reducers.
  // -------------------------------------------------------------------
  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.operators.Skew
      .saltedJoin(o, c.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey", factor = 8)
      .groupBy(col("o_orderstatus"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus", "c_mktsegment")
  }

  val skewSaltedJoinSql: String =
    """SELECT o_orderstatus, c_mktsegment, count(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2 ORDER BY o_orderstatus, c_mktsegment""".stripMargin

  // -------------------------------------------------------------------
  // Column-level data profiling (single-pass agg; long-form output).
  // -------------------------------------------------------------------
  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile
      .profileExact(Tables.load(spark, dir, "orders"))
      .orderBy("col_name")

  val profileOrdersSql: String = {
    def one(c: String, numeric: Boolean) = {
      val mn = if (numeric) s"CAST(floor(min($c) * 1e6) AS BIGINT)" else "CAST(NULL AS BIGINT)"
      val mx = if (numeric) s"CAST(floor(max($c) * 1e6) AS BIGINT)" else "CAST(NULL AS BIGINT)"
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         | count(*) FILTER ($c IS NULL) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | $mn AS min_num_u, $mx AS max_num_u FROM orders""".stripMargin
    }
    Seq(
      one("o_orderkey", true), one("o_custkey", true),
      one("o_orderstatus", false), one("o_totalprice", true),
      one("o_orderdate", false), one("o_orderpriority", false))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // -------------------------------------------------------------------
  // PII redaction: plant synthetic emails/phones/ids, scrub, fingerprint
  // the scrubbed text (training-data hygiene pass; pure regexp chain).
  // -------------------------------------------------------------------
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(
      substring(col("text"), 1, 40),
      lit(" mail me: u"), col("doc_id").cast("string"), lit("@ex.org call +1 555 010 "),
      lpad(col("doc_id").cast("string"), 4, "0"),
      lit(" acct 123456789012 done"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.redactPii(planted).as("clean"))
      .select(col("doc_id"),
        graft.functions.FingerprintExpr.fingerprint(col("clean")).as("clean_fp"),
        (size(split(col("clean"), "<EMAIL>", -1)) - 1).as("n_emails"),
        (size(split(col("clean"), "<PHONE>", -1)) - 1).as("n_phones"))
      .orderBy("doc_id")
  }

  val redactPiiSql: String = {
    import graft.functions.TextFunctions.{emailRe, longDigitsRe, phoneRe}
    val planted =
      "substr(text, 1, 40) || ' mail me: u' || CAST(doc_id AS VARCHAR) || " +
        "'@ex.org call +1 555 010 ' || lpad(CAST(doc_id AS VARCHAR), 4, '0') || " +
        "' acct 123456789012 done'"
    // NB: DuckDB regexp_replace needs the 'g' flag (Spark replaces all
    // matches by default)
    val clean =
      s"regexp_replace(regexp_replace(regexp_replace($planted, '$emailRe', '<EMAIL>', 'g'), '$longDigitsRe', '<NUM>', 'g'), '$phoneRe', '<PHONE>', 'g')"
    s"""SELECT doc_id,
       | list_reduce(list_prepend(CAST(7 AS BIGINT),
       |   list_transform(str_split($clean, ''), c -> CAST(unicode(c) AS BIGINT))),
       |   (acc, cp) -> (acc * 31 + cp) % 2147483647) AS clean_fp,
       | len(str_split($clean, '<EMAIL>')) - 1 AS n_emails,
       | len(str_split($clean, '<PHONE>')) - 1 AS n_phones
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // Bucketed shuffle-free join, end-to-end: write both fact tables
  // bucketed+sorted on the join key (the write-time shuffle a 100 TB
  // deployment pays ONCE), then join and aggregate off the bucketed
  // layout — the join itself runs with zero Exchange on either side
  // (plan-asserted in BucketedJoinSpec; this entry oracle-checks the
  // RESULT, which bucketing must not change). Table names carry a dir
  // hash so sessions on DIFFERENT scale factors can't clash in a
  // shared warehouse; two concurrent sessions on the SAME sf dir would
  // still race on the table (the driver's verify/bench flows run
  // sequentially — a shared multi-writer warehouse needs a lakehouse
  // format with transactional commit, see README connector seams).
  // -------------------------------------------------------------------
  def bucketedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val sfx = (dir.hashCode & 0x7fffffff).toString
    val to = s"graft_bkt_orders_$sfx"
    val tl = s"graft_bkt_lineitem_$sfx"
    graft.sinks.Bucketing.writeBucketed(
      Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_orderpriority"),
      to, keys = Seq("o_orderkey"), numBuckets = 8,
      sortBy = Seq("o_orderkey"))
    graft.sinks.Bucketing.writeBucketed(
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice"),
      tl, keys = Seq("l_orderkey"), numBuckets = 8,
      sortBy = Seq("l_orderkey"))
    val o = spark.table(to)
    val l = spark.table(tl)
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val bucketedJoinAggSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // Approximate aggregates under an INVARIANT oracle (the
  // keymap_scalable pattern): approx_count_distinct (HLL++) and
  // approx_percentile (GK summaries) have engine-specific sketch
  // internals DuckDB cannot replay, but their ERROR CONTRACTS are
  // checkable exactly. The Spark side evaluates the contract to a
  // boolean next to exact anchor values; the oracle recomputes the
  // anchors exactly and pins the booleans at TRUE. Both sketches are
  // hash-based and deterministic for fixed data, and the asserted
  // bounds (5% on a 2% rsd HLL; p45..p55 on a 1e-4 rank-error median)
  // sit far outside worst-case error, so the flags cannot flap with
  // partitioning/merge order. At 100 TB these sketches ARE the
  // count-distinct/percentile story: constant memory, one pass,
  // mergeable partials — the exact forms here exist to judge them.
  // -------------------------------------------------------------------
  def approxAggBounds(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("cd_exact"),
        approx_count_distinct(col("o_custkey"), 0.02).as("__acd"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("__amed"),
        expr("percentile(o_totalprice, 0.45)").as("__p45"),
        expr("percentile(o_totalprice, 0.55)").as("__p55"))
      .select(col("n_rows"), col("cd_exact"),
        (abs(col("__acd") - col("cd_exact")) <=
          col("cd_exact").cast("double") * 0.05).as("acd_within_5pct"),
        col("__amed").between(col("__p45"), col("__p55"))
          .as("amed_within_decile"))
  }

  val approxAggBoundsSql: String =
    """SELECT count(*) AS n_rows,
      | count(DISTINCT o_custkey) AS cd_exact,
      | TRUE AS acd_within_5pct,
      | TRUE AS amed_within_decile
      |FROM orders""".stripMargin

  // -------------------------------------------------------------------
  // Incremental materialized-aggregate maintenance (MaterializedAgg):
  // the rollup is maintained as mergeable state — base state (orders up
  // to the watermark) merged with the delta's state must equal the
  // direct aggregate over everything, which is exactly what the DuckDB
  // oracle computes. Decimal sums make the equality bit-exact
  // regardless of how the data was split.
  // -------------------------------------------------------------------
  def mvIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.MaterializedAgg
    val o = Tables.load(spark, dir, "orders")
    val keys = Seq("o_orderstatus")
    val values = Seq("o_totalprice")
    val bookmark = lit("1996-06-15").cast("timestamp")
    val base = MaterializedAgg.state(
      o.where(col("o_orderdate") <= bookmark), keys, values)
    val delta = MaterializedAgg.state(
      o.where(col("o_orderdate") > bookmark), keys, values)
    MaterializedAgg.finish(
        MaterializedAgg.merge(keys, values, base, delta), values)
      .orderBy("o_orderstatus")
  }

  val mvIncrementalSql: String =
    """SELECT o_orderstatus,
      | count(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
      |   AS sum_o_totalprice,
      | min(o_totalprice) AS min_o_totalprice,
      | max(o_totalprice) AS max_o_totalprice,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
      |   / CAST(count(*) AS DOUBLE) AS avg_o_totalprice
      |FROM orders GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // Retractable MV maintenance under MUTATION (deletes + in-place
  // updates + inserts): base state + signed state of a NORMALIZED
  // changelog (U → D-old + I-new, Cdc.changelogSigned) must equal the
  // direct aggregate of the mutated table — which is what the oracle
  // computes. Decimal arithmetic makes the retraction exact: −old
  // cancels +old to the last digit.
  // -------------------------------------------------------------------
  def mvCdcUpdate(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Cdc, MaterializedAgg}
    val o = Tables.load(spark, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"))
    val bm = lit("1996-06-15").cast("timestamp")
    val before = o.where(col("o_orderdate") <= bm).drop("o_orderdate")
    val after = before.where(col("o_orderkey") % 10 =!= 3) // deletes
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 10 === 4, col("o_totalprice") + lit(1000.0))
          .otherwise(col("o_totalprice"))) // updates
      .unionByName(
        o.where(col("o_orderdate") > bm).drop("o_orderdate")) // inserts
    val keys = Seq("o_orderstatus")
    val values = Seq("o_totalprice")
    val base = MaterializedAgg.retractState(before, keys, values, lit(1))
    val delta = MaterializedAgg.retractStateOf(
      Cdc.changelogSigned(before, after, Seq("o_orderkey")), keys, values)
    MaterializedAgg.finishRetract(
        MaterializedAgg.mergeRetract(keys, values, base, delta), values)
      .orderBy("o_orderstatus")
  }

  val mvCdcUpdateSql: String =
    """WITH b AS (SELECT o_orderkey, o_orderstatus, o_totalprice
      |           FROM orders WHERE o_orderdate <= TIMESTAMP '1996-06-15'),
      |aft AS (
      | SELECT o_orderkey, o_orderstatus,
      |   CASE WHEN o_orderkey % 10 = 4 THEN o_totalprice + 1000.0
      |        ELSE o_totalprice END AS o_totalprice
      | FROM b WHERE o_orderkey % 10 <> 3
      | UNION ALL
      | SELECT o_orderkey, o_orderstatus, o_totalprice
      | FROM orders WHERE o_orderdate > TIMESTAMP '1996-06-15')
      |SELECT o_orderstatus, count(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
      |   AS sum_o_totalprice,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
      |   / CAST(count(*) AS DOUBLE) AS avg_o_totalprice
      |FROM aft GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // Ordered funnel over the events stream: view → click → purchase,
  // each stage's timestamp being the FIRST occurrence at-or-after the
  // previous stage (a purchase before the first view does not count).
  // Three conditional-min window passes over ONE user_id exchange —
  // the chained-stage semantics without self-joins (a 3-way self-join
  // would shuffle the events table three times; this shuffles once).
  // -------------------------------------------------------------------
  def funnelEvents(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").select(
      col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val wU = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val staged = e
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts_us"))).over(wU))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts_us") >= col("t1"),
          col("ts_us"))).over(wU))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts_us") >= col("t2"),
          col("ts_us"))).over(wU))
    staged.groupBy("user_id")
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_view_click"),
        sum(when(col("t3").isNotNull, 1L).otherwise(0L))
          .as("n_view_click_purchase"))
  }

  val funnelEventsSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
      |           FROM events),
      |u AS (
      | SELECT user_id,
      |   min(CASE WHEN event_type = 'view' THEN ts_us END) AS t1
      | FROM e GROUP BY user_id),
      |u2 AS (
      | SELECT e.user_id, u.t1,
      |   min(CASE WHEN event_type = 'click' AND ts_us >= t1
      |       THEN ts_us END) AS t2
      | FROM e JOIN u USING (user_id) GROUP BY e.user_id, u.t1),
      |u3 AS (
      | SELECT e.user_id, u2.t1, u2.t2,
      |   min(CASE WHEN event_type = 'purchase' AND ts_us >= t2
      |       THEN ts_us END) AS t3
      | FROM e JOIN u2 USING (user_id) GROUP BY e.user_id, u2.t1, u2.t2)
      |SELECT count(*) AS n_users,
      | CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_view,
      | CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_view_click,
      | CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_view_click_purchase
      |FROM u3""".stripMargin

  // -------------------------------------------------------------------
  // Winsorization (Normalize.winsorize): heavy-tail outlier treatment —
  // clip to the exact [p05, p95] quantiles, then aggregate the clipped
  // column per group. The oracle replays quantile_cont (interpolated,
  // same definition as Spark's percentile — parity already pinned by
  // agg_percentile) and the clip. Decimal sums keep the compare exact.
  // -------------------------------------------------------------------
  def winsorizePrices(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val o = Tables.load(spark, dir, "orders")
    graft.operators.Normalize.winsorize(o, "o_totalprice", 0.05, 0.95)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(25, 6))).cast("double")
          .as("sum_clipped"),
        min("o_totalprice").as("min_clipped"),
        max("o_totalprice").as("max_clipped"))
      .orderBy("o_orderstatus")
  }

  // -------------------------------------------------------------------
  // Approx-percentile winsorization (Normalize.winsorizeApprox) under
  // the sketch-error-bounds pattern of approx_agg_bounds: the exact
  // clip values are sketch-dependent, so the oracle pins the bounded-
  // error CONTRACT instead — after clipping, min(out) IS the sketch's
  // lower bound and max(out) its upper (sf0.01 has mass beyond both
  // quantiles), and each must land inside the exact ±2-percentile
  // band; row count and interior values ride through unchanged. With
  // accuracy=10000 over 15k rows the rank error is ≤ ~2 ranks, far
  // inside the band — a regression to a broken sketch or a clip that
  // drops/fills rows flips a boolean and fails the hash.
  // -------------------------------------------------------------------
  def winsorizeApprox(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val o = Tables.load(spark, dir, "orders")
    val w = graft.operators.Normalize
      .winsorizeApprox(o, "o_totalprice", 0.05, 0.95, accuracy = 10000)
    val exact = o.agg(
      expr("percentile(o_totalprice, 0.03)").as("__lo3"),
      expr("percentile(o_totalprice, 0.07)").as("__lo7"),
      expr("percentile(o_totalprice, 0.93)").as("__hi93"),
      expr("percentile(o_totalprice, 0.97)").as("__hi97"))
    w.agg(
        count(lit(1)).as("n_rows"),
        min(col("o_totalprice")).as("__min"),
        max(col("o_totalprice")).as("__max"),
        sum(when(col("o_totalprice").isNull, 1).otherwise(0)).as("__nnull"))
      .crossJoin(broadcast(exact))
      .select(
        col("n_rows"),
        col("__min").between(col("__lo3"), col("__lo7"))
          .as("lo_within_band"),
        col("__max").between(col("__hi93"), col("__hi97"))
          .as("hi_within_band"),
        (col("__nnull") === 0).as("no_nulls_introduced"))
  }

  val winsorizeApproxSql: String =
    """SELECT count(*) AS n_rows,
      | TRUE AS lo_within_band,
      | TRUE AS hi_within_band,
      | TRUE AS no_nulls_introduced
      |FROM orders""".stripMargin

  val winsorizePricesSql: String =
    """WITH b AS (SELECT quantile_cont(o_totalprice, 0.05) AS lo,
      |                  quantile_cont(o_totalprice, 0.95) AS hi
      |           FROM orders),
      |w AS (SELECT o_orderstatus,
      |        CASE WHEN o_totalprice IS NULL THEN NULL
      |             ELSE least(greatest(o_totalprice, lo), hi) END AS p
      |      FROM orders CROSS JOIN b)
      |SELECT o_orderstatus, count(*) AS n,
      | CAST(SUM(CAST(p AS DECIMAL(25,6))) AS DOUBLE) AS sum_clipped,
      | min(p) AS min_clipped, max(p) AS max_clipped
      |FROM w GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // Equi-width histogram (Profile.histogram) — profiling depth: 10 bins
  // over o_totalprice, top edge closed. Bin arithmetic is identical
  // IEEE double ops in both engines, so bin membership cannot straddle.
  // -------------------------------------------------------------------
  def profileHistogram(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.histogram(
      Tables.load(spark, dir, "orders"), "o_totalprice", nBins = 10)

  val profileHistogramSql: String =
    """WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |           FROM orders)
      |SELECT CAST(CASE WHEN hi = lo THEN 0
      |  ELSE least(CAST(floor((o_totalprice - lo) * 10 / (hi - lo))
      |             AS INTEGER), 9) END AS INTEGER) AS bin,
      | count(*) AS n
      |FROM orders CROSS JOIN b
      |WHERE o_totalprice IS NOT NULL
      |GROUP BY 1 ORDER BY bin""".stripMargin

  // -------------------------------------------------------------------
  // RECURSIVE CTE (Spark 4 WITH RECURSIVE): bounded transitive closure
  // over the supplier↔part shipment graph — BFS levels from the
  // smallest supplier in a deterministic edge slice, parts counted at
  // their MINIMUM level. Iterative graph reach is a shape the
  // reference's SQL surface (and pre-4.x Spark) cannot express in one
  // statement; the driver-side loop alternative (ConnectedComponents'
  // pointer-jumping) exists for the unbounded case — this is the
  // in-engine bounded form. The edge slice (2% of parts × 10% of
  // suppliers) keeps each iteration's join linear in the slice at
  // every SF; SELECT DISTINCT inside the recursive term caps a level
  // at |parts| rows, so depth×|slice| bounds the whole evaluation.
  // -------------------------------------------------------------------
  def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(recursiveCteSql)
  }

  val recursiveCteSql: String =
    """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT l_suppkey AS s, l_partkey AS p
      |  FROM lineitem
      |  WHERE l_partkey % 50 = 0 AND l_suppkey % 10 = 0
      |), reach(part, lvl) AS (
      |  SELECT p, 1 FROM edges
      |  WHERE s = (SELECT min(s) FROM edges)
      |  UNION ALL
      |  SELECT DISTINCT e2.p, r.lvl + 1
      |  FROM reach r
      |  JOIN edges e1 ON e1.p = r.part
      |  JOIN edges e2 ON e2.s = e1.s
      |  WHERE r.lvl < 3
      |)
      |SELECT lvl, count(*) AS n_parts
      |FROM (SELECT part, min(lvl) AS lvl FROM reach GROUP BY part)
      |GROUP BY lvl ORDER BY lvl""".stripMargin

  // -------------------------------------------------------------------
  // LATERAL correlated subquery with LIMIT: per-nation top-2 customers
  // by balance. The other decorrelation family next to `subqueries`
  // (scalar + IN): a per-row dependent TABLE subquery, which Catalyst
  // rewrites into a ranked join rather than N index probes — the same
  // WindowGroupLimit plan `topk_per_group` pins, reached from SQL the
  // reference's BigQuery layer could not write.
  // -------------------------------------------------------------------
  def lateralTopk(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "nation").createOrReplaceTempView("nation")
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(lateralTopkSql)
  }

  val lateralTopkSql: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n,
      |LATERAL (SELECT c_name, c_acctbal FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  // -------------------------------------------------------------------
  // Retention cohort matrix: users grouped by FIRST-ACTIVE day, tracked
  // by distinct active days since — the product-analytics staple. One
  // user_id exchange computes the cohort day as a window min; the
  // (cohort, offset) matrix is then a grouped count over distinct
  // (user, day) pairs. No self-join of events against first-events.
  // -------------------------------------------------------------------
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val w = Window.partitionBy(col("user_id"))
    val withCohort = e.withColumn("cohort", min(col("day")).over(w))
    withCohort
      .select(col("user_id"), col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("days_since"))
      .distinct()
      .groupBy("cohort", "days_since")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "days_since")
  }

  val retentionCohortsSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, day,
      |        min(day) OVER (PARTITION BY user_id) AS cohort FROM e)
      |SELECT cohort, CAST(day - cohort AS BIGINT) AS days_since,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM c GROUP BY cohort, days_since
      |ORDER BY cohort, days_since""".stripMargin

  // -------------------------------------------------------------------
  // Last-touch attribution: each purchase credits the user's most
  // recent PRIOR click — the as-of pattern INSIDE one table, expressed
  // as a conditional last_value carry-forward over a single user_id
  // exchange (never a range self-join of purchases against clicks).
  // Money rides as integer cents.
  // -------------------------------------------------------------------
  def attributionLastTouch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
    // (ts, event_id) — equal timestamps otherwise leave the carry-
    // forward order engine-dependent and the oracle hash unstable
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val attr = e.withColumn("click_ts",
      last(when(col("event_type") === "click", col("ts")),
        ignoreNulls = true).over(w))
    attr.where(col("event_type") === "purchase" &&
        col("click_ts").isNotNull)
      .groupBy(to_date(col("click_ts")).as("click_day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("cents"))
      .orderBy("click_day")
  }

  val attributionLastTouchSql: String =
    """WITH e AS (SELECT user_id, ts, event_id, event_type,
      |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
      |a AS (SELECT *,
      |  last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts
      | FROM e)
      |SELECT CAST(click_ts AS DATE) AS click_day,
      |       CAST(count(*) AS BIGINT) AS n_purchases,
      |       CAST(sum(cents) AS BIGINT) AS cents
      |FROM a WHERE event_type = 'purchase' AND click_ts IS NOT NULL
      |GROUP BY click_day ORDER BY click_day""".stripMargin

  // -------------------------------------------------------------------
  // Keyed dataset diff (operators/DataDiff) — the regression primitive
  // of every engine/code migration: one full-outer join classifies
  // rows (only_left/only_right/changed/identical) and per-column
  // null-safe comparisons say WHICH columns drifted. The right side is
  // the left with surgical, formula-known mutations, so the oracle
  // replays the whole classification.
  // -------------------------------------------------------------------
  def dataDiff(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer").select(
      col("c_custkey"), col("c_name"), col("c_mktsegment"),
      floor(col("c_acctbal") * 100).cast("long").as("cents"))
    val left = c.where(col("c_custkey") <= 1200)
    val right = c.where(col("c_custkey").between(201, 1400)).select(
      col("c_custkey"),
      when(col("c_custkey") % 10 === 0, upper(col("c_name")))
        .otherwise(col("c_name")).as("c_name"),
      col("c_mktsegment"),
      when(col("c_custkey") % 7 === 0, col("cents") + 1)
        .otherwise(col("cents")).as("cents"))
    graft.operators.DataDiff.summary(left, right, Seq("c_custkey"))
  }

  val dataDiffSql: String =
    """WITH c AS (SELECT c_custkey, c_name, c_mktsegment,
      |    CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
      |l AS (SELECT * FROM c WHERE c_custkey <= 1200),
      |r AS (SELECT c_custkey,
      |        CASE WHEN c_custkey % 10 = 0 THEN upper(c_name)
      |             ELSE c_name END AS c_name,
      |        c_mktsegment,
      |        CASE WHEN c_custkey % 7 = 0 THEN cents + 1
      |             ELSE cents END AS cents
      |      FROM c WHERE c_custkey BETWEEN 201 AND 1400),
      |j AS (SELECT l.c_custkey AS lk, r.c_custkey AS rk,
      |        l.c_name AS ln, r.c_name AS rn,
      |        l.c_mktsegment AS lm, r.c_mktsegment AS rm,
      |        l.cents AS lc, r.cents AS rc
      |      FROM l FULL OUTER JOIN r ON l.c_custkey = r.c_custkey)
      |SELECT
      | CAST(sum(CASE WHEN rk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_only_left,
      | CAST(sum(CASE WHEN lk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_only_right,
      | CAST(sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL AND
      |   (ln IS DISTINCT FROM rn OR lm IS DISTINCT FROM rm
      |    OR lc IS DISTINCT FROM rc) THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_changed,
      | CAST(sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL AND
      |   NOT (ln IS DISTINCT FROM rn OR lm IS DISTINCT FROM rm
      |    OR lc IS DISTINCT FROM rc) THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_identical,
      | CAST(sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL AND
      |   ln IS DISTINCT FROM rn THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_changed_c_name,
      | CAST(sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL AND
      |   lm IS DISTINCT FROM rm THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_changed_c_mktsegment,
      | CAST(sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL AND
      |   lc IS DISTINCT FROM rc THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_changed_cents
      |FROM j""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "data_diff" -> (dataDiff _),
    "retention_cohorts" -> (retentionCohorts _),
    "attribution_last_touch" -> (attributionLastTouch _),
    "recursive_cte" -> (recursiveCte _),
    "lateral_topk" -> (lateralTopk _),
    "winsorize_prices" -> (winsorizePrices _),
    "winsorize_approx" -> (winsorizeApprox _),
    "profile_histogram" -> (profileHistogram _),
    "funnel_events" -> (funnelEvents _),
    "mv_cdc_update" -> (mvCdcUpdate _),
    "mv_incremental" -> (mvIncremental _),
    "approx_agg_bounds" -> (approxAggBounds _),
    "bucketed_join_agg" -> (bucketedJoinAgg _),
    "profile_orders" -> (profileOrders _),
    "redact_pii" -> (redactPii _),
    "skew_salted_join" -> (skewSaltedJoin _),
    "tpch_revenue" -> (tpchRevenue _),
    "agg_cube" -> (aggCube _),
    "agg_percentile" -> (aggPercentile _),
    "window_range_frame" -> (windowRangeFrame _),
    "string_funcs" -> (stringFuncs _),
    "array_agg" -> (arrayAgg _),
    "sessionize_batch" -> (sessionizeBatch _),
    "range_join_events" -> (rangeJoinEvents _),
    "subqueries" -> (subqueries _))

  val oracles: Map[String, String] = Map(
    "data_diff" -> dataDiffSql,
    "retention_cohorts" -> retentionCohortsSql,
    "attribution_last_touch" -> attributionLastTouchSql,
    "recursive_cte" -> recursiveCteSql,
    "lateral_topk" -> lateralTopkSql,
    "winsorize_prices" -> winsorizePricesSql,
    "winsorize_approx" -> winsorizeApproxSql,
    "profile_histogram" -> profileHistogramSql,
    "funnel_events" -> funnelEventsSql,
    "mv_cdc_update" -> mvCdcUpdateSql,
    "mv_incremental" -> mvIncrementalSql,
    "approx_agg_bounds" -> approxAggBoundsSql,
    "bucketed_join_agg" -> bucketedJoinAggSql,
    "profile_orders" -> profileOrdersSql,
    "redact_pii" -> redactPiiSql,
    "skew_salted_join" -> skewSaltedJoinSql,
    "tpch_revenue" -> tpchRevenueSql,
    "agg_cube" -> aggCubeSql,
    "agg_percentile" -> aggPercentileSql,
    "window_range_frame" -> windowRangeFrameSql,
    "string_funcs" -> stringFuncsSql,
    "array_agg" -> arrayAggSql,
    "sessionize_batch" -> sessionizeBatchSql,
    "range_join_events" -> rangeJoinEventsSql,
    "subqueries" -> subqueriesSql)
}
