package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Par

/** Third-wave analytics surface: time-series gap-filling, a
  * declarative data-quality expectation report, and fixed-iteration
  * PageRank over the supplier↔part shipment graph — the warehouse-side
  * operators a reference user reaches for right after the ETL layer
  * (reference scope: jobs/semantic/ builds reporting marts; these are
  * the standard next queries over such marts).
  */
object QueriesAnalytics {

  // -------------------------------------------------------------------
  // Time-series gap-fill + forward-fill: daily order revenue per
  // priority on a complete date spine, missing days filled with 0
  // counts and last-observation-carried-forward revenue.
  //
  // 100 TB shape: the only full-data pass is the (prio, day) partial
  // aggregation — one shuffle whose output is bounded by |days|×|groups|
  // (thousands of rows regardless of fact size). The spine is built
  // RELATIONALLY from a 1-row bounds aggregate (`sequence` + explode) —
  // no driver-side date loop, no collect. Spine⋈daily and the
  // forward-fill window both run on that bounded aggregate, so the
  // window's per-group ordering never touches fact-table volume.
  // -------------------------------------------------------------------
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("day"),
        col("o_totalprice"))
    val daily = o.groupBy("prio", "day")
      .agg(count(lit(1)).as("n_orders"),
        Queries.dsum(col("o_totalprice")).as("revenue"))
    val days = o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val spine = days.crossJoin(broadcast(o.select("prio").distinct()))
    val w = Window.partitionBy("prio").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(broadcast(daily), Seq("prio", "day"), "left")
      .select(col("prio"),
        date_format(col("day"), "yyyy-MM-dd").as("d"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("revenue").isNull.as("is_gap"),
        coalesce(last(col("revenue"), ignoreNulls = true).over(w), lit(0.0))
          .as("ffill_revenue"))
      .orderBy("prio", "d")
  }

  val gapFillSql: String =
    """WITH o AS (SELECT o_orderpriority AS prio,
      |  CAST(o_orderdate AS DATE) AS day, o_totalprice FROM orders),
      |daily AS (SELECT prio, day, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      | FROM o GROUP BY 1, 2),
      |days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      | FROM (SELECT min(day) AS d0, max(day) AS d1 FROM o)),
      |spine AS (SELECT p.prio, days.day
      | FROM days CROSS JOIN (SELECT DISTINCT prio FROM o) p)
      |SELECT s.prio AS prio, strftime(s.day, '%Y-%m-%d') AS d,
      | coalesce(daily.n_orders, 0) AS n_orders,
      | daily.revenue IS NULL AS is_gap,
      | coalesce(last_value(daily.revenue IGNORE NULLS) OVER (
      |   PARTITION BY s.prio ORDER BY s.day
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS ffill_revenue
      |FROM spine s LEFT JOIN daily ON daily.prio = s.prio AND daily.day = s.day
      |ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // Declarative data-quality expectation report (deequ-style): each
  // rule emits (rule, table, n_checked, n_violations, pass). Rules over
  // one table share ONE scan via conditional aggregation; uniqueness is
  // a count-vs-count-distinct on the same aggregate; referential
  // integrity is a left-anti join on the key.
  //
  // 100 TB shape: lineitem and orders are each scanned exactly once for
  // their conditional-aggregate rules (a single partial-agg shuffle of
  // 1 row per partition). The referential rule's anti-join shuffles
  // both sides on the key — the standard distributed set-difference;
  // with a dimension-sized right side Spark's AQE flips it to broadcast
  // automatically. Nothing here collects, and adding a rule to an
  // existing table adds ZERO scans.
  // -------------------------------------------------------------------
  def dqExpectations(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    def viol(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

    // one scan of lineitem for all its row-level rules; the 1-row
    // aggregate is pinned so the seven union branches below reference
    // the materialized row instead of re-planning (and re-scanning)
    // the aggregate once per branch
    val liAgg = Par.pinLocal(li.agg(
      count(lit(1)).as("n"),
      viol(col("l_orderkey").isNull).as("v_null"),
      viol(!col("l_quantity").between(1.0, 50.0)).as("v_range"),
      viol(col("l_quantity") > 30.0).as("v_qty30"),
      viol(col("l_extendedprice") <= 0.0).as("v_price")))
    // one scan of orders: accepted values + key uniqueness
    val oAgg = Par.pinLocal(o.agg(
      count(lit(1)).as("n"),
      viol(!col("o_orderstatus").isin("O", "F", "P")).as("v_status"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_dupkey")))
    val orphans = li.join(o.select(col("o_orderkey")),
        li("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))

    def row(agg: DataFrame, rule: String, table: String, n: Column,
        v: Column): DataFrame =
      agg.select(lit(rule).as("rule"), lit(table).as("table_name"),
        n.cast("long").as("n_checked"), v.cast("long").as("n_violations"),
        (v === 0L).as("pass"))

    row(liAgg, "not_null:l_orderkey", "lineitem", col("n"), col("v_null"))
      .unionByName(row(liAgg, "range:l_quantity:1-50", "lineitem",
        col("n"), col("v_range")))
      .unionByName(row(liAgg, "range:l_quantity:<=30", "lineitem",
        col("n"), col("v_qty30")))
      .unionByName(row(liAgg, "positive:l_extendedprice", "lineitem",
        col("n"), col("v_price")))
      .unionByName(row(oAgg, "accepted:o_orderstatus", "orders",
        col("n"), col("v_status")))
      .unionByName(row(oAgg, "unique:o_orderkey", "orders",
        col("n"), col("v_dupkey")))
      .unionByName(row(liAgg.select(col("n")).crossJoin(orphans),
        "ref:l_orderkey->orders", "lineitem", col("n"), col("v")))
      .orderBy("rule")
  }

  val dqExpectationsSql: String =
    """WITH li AS (SELECT count(*) AS n,
      |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
      |  CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1.0 AND 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
      |  CAST(sum(CASE WHEN l_quantity > 30.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty30,
      |  CAST(sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price
      | FROM lineitem),
      |o AS (SELECT count(*) AS n,
      |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
      |  count(*) - count(DISTINCT o_orderkey) AS v_dupkey
      | FROM orders),
      |orph AS (SELECT count(*) AS v FROM lineitem l
      | WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |SELECT * FROM (
      | SELECT 'not_null:l_orderkey' AS rule, 'lineitem' AS table_name,
      |   n AS n_checked, v_null AS n_violations, v_null = 0 AS pass FROM li
      | UNION ALL SELECT 'range:l_quantity:1-50', 'lineitem', n, v_range, v_range = 0 FROM li
      | UNION ALL SELECT 'range:l_quantity:<=30', 'lineitem', n, v_qty30, v_qty30 = 0 FROM li
      | UNION ALL SELECT 'positive:l_extendedprice', 'lineitem', n, v_price, v_price = 0 FROM li
      | UNION ALL SELECT 'accepted:o_orderstatus', 'orders', n, v_status, v_status = 0 FROM o
      | UNION ALL SELECT 'unique:o_orderkey', 'orders', n, v_dupkey, v_dupkey = 0 FROM o
      | UNION ALL SELECT 'ref:l_orderkey->orders', 'lineitem',
      |   (SELECT n FROM li), v, v = 0 FROM orph
      |) ORDER BY rule""".stripMargin

  // -------------------------------------------------------------------
  // Fixed-iteration PageRank over the undirected supplier↔part shipment
  // graph (edge = "supplier shipped part", both directions so no
  // dangling nodes). ALL arithmetic is 64-bit integer in 1e-12 units —
  // contribution = pr DIV degree, damping = (sum*85) DIV 100 — so the
  // result is bit-exact regardless of partial-aggregation order (double
  // summation over an arbitrary partition order is not associative;
  // integer summation is). Total mass ≤ |V|·1e12 keeps every
  // intermediate far below 2^63 under ANSI overflow checking.
  //
  // 100 TB shape: edges are co-partitioned on src ONCE and pinned; each
  // of the 3 rounds is one co-partitioned join edges⋈pr (pr re-shuffles
  // on node — |V| rows, small relative to |E|) plus one partial-agg
  // shuffle on dst. Per-round pin() bounds lineage exactly like
  // ConnectedComponents (operators/ConnectedComponents.scala), so a
  // round never silently recomputes its predecessors.
  // -------------------------------------------------------------------
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val li = Par.widen(Tables.load(spark, dir, "lineitem"))
    val e0 = li.select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct()
    // nodes ride as LONGS internally (supplier 2k, part 2k+1): the
    // edge table shuffles 8-byte keys instead of the oracle's "s123"/
    // "p456" strings — converted back only on the 20-row output, where
    // the oracle's string form (and its tiebreak order) applies
    val edges = e0.select((col("s") * 2).as("src"),
        (col("p") * 2 + 1).as("dst"))
      .unionByName(e0.select((col("p") * 2 + 1).as("src"),
        (col("s") * 2).as("dst")))
    val ep = Par.pin(edges.repartition(col("src")))
    val deg = ep.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = Par.pin(ep.join(broadcast(deg), "src")) // (src, dst, deg) ×3
    var pr = deg.select(col("src").as("node"),
      lit(1000000000000L).as("pr"))
    for (_ <- 1 to 3) {
      // pr is |V|-sized — broadcast keeps each iteration's only
      // exchange the contribution groupBy
      pr = Par.pin(ed.join(broadcast(pr), ed("src") === pr("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("sc"))
        .select(col("dst").as("node"),
          (lit(150000000000L) + expr("sc * 85 div 100")).as("pr")))
    }
    pr.select(
        when(col("node") % 2 === 0,
          concat(lit("s"), (col("node") / 2).cast("long").cast("string")))
          .otherwise(
            concat(lit("p"), ((col("node") - 1) / 2).cast("long")
              .cast("string"))).as("node"),
        col("pr").as("pr_units"))
      .orderBy(col("pr_units").desc, col("node").asc)
      .limit(20)
  }

  val pageRankSql: String =
    """WITH e0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
      |edges AS (
      | SELECT 's' || CAST(s AS VARCHAR) AS src, 'p' || CAST(p AS VARCHAR) AS dst FROM e0
      | UNION ALL
      | SELECT 'p' || CAST(p AS VARCHAR), 's' || CAST(s AS VARCHAR) FROM e0),
      |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
      |pr0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS pr FROM deg),
      |it1 AS (SELECT e.dst AS node,
      |  150000000000 + (CAST(sum(p.pr // d.deg) AS BIGINT) * 85) // 100 AS pr
      | FROM edges e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.src = e.src
      | GROUP BY 1),
      |it2 AS (SELECT e.dst AS node,
      |  150000000000 + (CAST(sum(p.pr // d.deg) AS BIGINT) * 85) // 100 AS pr
      | FROM edges e JOIN it1 p ON p.node = e.src JOIN deg d ON d.src = e.src
      | GROUP BY 1),
      |it3 AS (SELECT e.dst AS node,
      |  150000000000 + (CAST(sum(p.pr // d.deg) AS BIGINT) * 85) // 100 AS pr
      | FROM edges e JOIN it2 p ON p.node = e.src JOIN deg d ON d.src = e.src
      | GROUP BY 1)
      |SELECT node, CAST(pr AS BIGINT) AS pr_units FROM it3
      |ORDER BY pr_units DESC, node ASC LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // Robust outlier detection via median/MAD — the heavy-tail-safe twin
  // of anomaly_zscore (one wild value drags a mean+stddev gate, not a
  // median one). All statistics ride integer scalings (med2 = 2·median,
  // mad8 = 8·MAD, both exact integers for integer cents since an exact
  // percentile of ints is k or k+0.5), so the outlier rule
  // |x−med| > 3·MAD becomes the bit-exact integer test 2·d4 > 3·mad8.
  // Two grouped exact percentiles + one broadcast join back.
  // -------------------------------------------------------------------
  def robustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer").select(
      col("c_mktsegment"),
      floor(col("c_acctbal") * 100).cast("long").as("cents"))
    val med = c.groupBy("c_mktsegment")
      .agg(floor(expr("percentile(cents, 0.5) * 2")).cast("long").as("med2"))
    val dev = c.join(broadcast(med), "c_mktsegment")
      .withColumn("d4", abs(col("cents") * 4 - col("med2") * 2))
    val mad = dev.groupBy("c_mktsegment")
      .agg(floor(expr("percentile(d4, 0.5) * 2")).cast("long").as("mad8"))
    dev.join(broadcast(mad), "c_mktsegment")
      .groupBy("c_mktsegment")
      .agg(first(col("med2")).as("med2"), first(col("mad8")).as("mad8"),
        count(lit(1)).as("n"),
        sum(when(col("d4") * 2 > col("mad8") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("c_mktsegment")
  }

  val robustOutliersSql: String =
    """WITH c AS (SELECT c_mktsegment,
      |    CAST(floor(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
      |med AS (SELECT c_mktsegment,
      |    CAST(floor(quantile_cont(cents, 0.5) * 2) AS BIGINT) AS med2
      |  FROM c GROUP BY c_mktsegment),
      |dev AS (SELECT c.c_mktsegment, cents, med2,
      |    abs(cents * 4 - med2 * 2) AS d4
      |  FROM c JOIN med USING (c_mktsegment)),
      |mad AS (SELECT c_mktsegment,
      |    CAST(floor(quantile_cont(d4, 0.5) * 2) AS BIGINT) AS mad8
      |  FROM dev GROUP BY c_mktsegment)
      |SELECT d.c_mktsegment,
      |  CAST(min(d.med2) AS BIGINT) AS med2,
      |  CAST(min(m.mad8) AS BIGINT) AS mad8,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN d.d4 * 2 > m.mad8 * 3 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m USING (c_mktsegment)
      |GROUP BY d.c_mktsegment
      |ORDER BY d.c_mktsegment""".stripMargin

  // -------------------------------------------------------------------
  // Triangle counting with DEGREE-ORDERED orientation over the parts-
  // co-ordered-together graph (edge = two parts in one order). The
  // orientation makes wedge generation O(sum outdeg²) with outdeg
  // bounded by ~sqrt(2m) — the standard distributed-triangle trick;
  // hub nodes (high degree) become wedge SINKS, not sources, so no
  // task enumerates a hub's neighbor pairs. The COUNT is orientation-
  // independent (each triangle closes exactly once under any total
  // order), so the oracle replays it with the simpler natural u<v
  // orientation and must agree exactly. n_wedges is the undirected
  // open-triad count (sum d·(d−1)/2), also orientation-free.
  // -------------------------------------------------------------------
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    // per-order sorted part lists, then ordered pairs generated MAP-SIDE
    // from each list (array combinatorics) — one groupBy shuffle instead
    // of a lineitem self-join, and the pair stream is already u < v
    val li = Par.widen(Tables.load(spark, dir, "lineitem"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val parts = li.groupBy("ok")
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
    val pairs = parts.select(explode(flatten(
      transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))),
          y => struct(x.as("u"), y.as("v")))))).as("p"))
    val e = Par.pin(
      pairs.select(col("p.u").as("u"), col("p.v").as("v")).distinct())
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient low-(degree, id) -> high-(degree, id)
    val du = deg.select(col("node").as("u"), col("d").as("du"))
    val dv = deg.select(col("node").as("v"), col("d").as("dv"))
    val uLow = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // deg is |V|-sized (small vs |E|) — AQE broadcasts both sides, so
    // `o` is a map-side projection of the pinned edge list: cheaper to
    // recompute for its two consumers than to materialize 1M+ rows
    val o = e.join(broadcast(du), "u").join(broadcast(dv), "v")
      .select(
        when(uLow, col("u")).otherwise(col("v")).as("src"),
        when(uLow, col("v")).otherwise(col("u")).as("dst"))
    // EDGE-ITERATOR count: per-node oriented adjacency lists, then per
    // edge (u,v) the triangles through it are |N+(u) ∩ N+(v)| — each
    // triangle's two lowest nodes point at the apex, so it is counted
    // exactly once. This never MATERIALIZES the wedge set (41M rows at
    // sf0.1 on this dense co-purchase graph); the intersection runs as
    // array math inside the scan of the edge list, and the orientation
    // bounds every adjacency list by ~sqrt(2m), so no row is huge and
    // no task is skewed.
    val adj = o.groupBy("src").agg(sort_array(collect_list(col("dst"))).as("ns"))
    val emptyNs = array().cast("array<bigint>")
    val tri = o
      .join(adj.select(col("src").as("ju"), col("ns").as("nu")),
        col("src") === col("ju"))
      .join(adj.select(col("src").as("jv"), col("ns").as("nv")),
        col("dst") === col("jv"), "left")
      .select(size(array_intersect(col("nu"),
        coalesce(col("nv"), emptyNs))).cast("long").as("t"))
      .agg(sum(col("t"))).collect().head.getLong(0)
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("d")) / 2).cast("long").as("n_edges"),
      sum(expr("d * (d - 1) div 2")).as("n_wedges")).collect().head
    spark.range(1).select(
      lit(stats.getLong(0)).as("n_nodes"),
      lit(stats.getLong(1)).as("n_edges"),
      lit(stats.getLong(2)).as("n_wedges"),
      lit(tri).as("n_triangles"))
  }

  val graphTrianglesSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |            FROM lineitem),
      |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
      |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |deg AS (SELECT node, count(*) AS d FROM (
      |  SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) t
      | GROUP BY node)
      |SELECT
      | (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
      | (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
      | (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
      | (SELECT CAST(count(*) AS BIGINT)
      |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
      |            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles""".stripMargin

  // -------------------------------------------------------------------
  // Wide→long unpivot (melt) of the lineitem measure columns via
  // Dataset.unpivot — ONE scan through a Catalyst Expand (4 output rows
  // per input row, no self-union re-scan), then per-(flag, metric)
  // stats. The oracle replays it as the portable UNION ALL form; the
  // Spark plan is the one that matters at scale: n metrics cost one
  // Expand, not n scans.
  // -------------------------------------------------------------------
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "v")
      .groupBy("l_returnflag", "metric")
      .agg(count(lit(1)).as("n"), Queries.dsum(col("v")).as("sum_v"))
      .orderBy("l_returnflag", "metric")
  }

  val unpivotMetricsSql: String =
    """WITH long AS (
      | SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS v FROM lineitem
      | UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      | UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      | UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
      |SELECT l_returnflag, metric, count(*) AS n,
      | CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE) AS sum_v
      |FROM long GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // Per-group z-score anomaly detection over events.value, with the
  // group mean/variance derived from EXACT integer sums (Σv, Σv² in
  // micro-units; Σv² through DECIMAL(38,0) — at 100 TB the squared sum
  // leaves int64 range). Partial aggregation order therefore cannot
  // perturb the statistics (float Welford merges are order-dependent;
  // integer/decimal sums are not), and the z expression is the same
  // double expression tree in both engines. The anomaly cut compares
  // the ROUNDED z so the filter boundary is engine-stable.
  //
  // 100 TB shape: one partial-agg shuffle for the per-type sums (rows =
  // |event types|), broadcast back into a map-side scoring pass —
  // the fact table never shuffles.
  // -------------------------------------------------------------------
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Par.widen(Tables.load(spark, dir, "events"))
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 1e6).cast("long").as("vu"))
    val st = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("vu")).as("s1"),
      sum(col("vu").cast("decimal(38,0)") * col("vu")).as("s2"))
    val scored = ev.join(broadcast(st), "event_type")
      .withColumn("z", round(expr(
        """(cast(vu as double) - cast(s1 as double) / cast(n as double))
          |/ sqrt((cast(s2 as double)
          |        - cast(s1 as double) * cast(s1 as double) / cast(n as double))
          |       / cast(n as double))""".stripMargin), 6))
    scored.where(abs(col("z")) >= 3.0)
      .select(col("event_type"), col("event_id"), col("vu"), col("z"))
      .orderBy("event_type", "event_id")
  }

  val anomalyZscoreSql: String =
    """WITH ev AS (SELECT event_id, event_type,
      |  CAST(floor(value * 1e6) AS BIGINT) AS vu FROM events),
      |st AS (SELECT event_type, count(*) AS n,
      |  CAST(sum(vu) AS BIGINT) AS s1,
      |  sum(CAST(vu AS DECIMAL(38,0)) * vu) AS s2
      | FROM ev GROUP BY 1),
      |sc AS (SELECT ev.event_type, ev.event_id, ev.vu,
      |  round((CAST(vu AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |        / sqrt((CAST(s2 AS DOUBLE)
      |                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |               / CAST(n AS DOUBLE)), 6) AS z
      | FROM ev JOIN st USING (event_type))
      |SELECT event_type, event_id, vu, z FROM sc
      |WHERE abs(z) >= 3.0 ORDER BY event_type, event_id""".stripMargin

  // -------------------------------------------------------------------
  // Exact equi-depth histogram of order totals: 10 equal-count buckets
  // in (price, key) order through Profile.equidepth — the two-phase
  // global rank (coarse-bucket row_numbers + broadcast offsets), never
  // a single-partition window. The oracle replays the semantics with
  // DuckDB's global row_number; the decomposition must be invisible in
  // the result, which is exactly what this row proves.
  // -------------------------------------------------------------------
  def histogramEquidepth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    graft.operators.Profile.equidepth(
      o, "o_totalprice", "o_orderkey", k = 10, coarseWidth = 10000.0)
  }

  val histogramEquidepthSql: String =
    """WITH r AS (SELECT o_totalprice AS v,
      |  row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
      |  count(*) OVER () AS n
      | FROM orders WHERE o_totalprice IS NOT NULL)
      |SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS bucket,
      | count(*) AS n, min(v) AS lo, max(v) AS hi
      |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin

  // -------------------------------------------------------------------
  // Materialized-view transparent rewrite (plans/MvRewrite.scala): a
  // (l_returnflag, l_linestatus) aggregate view is built once, the
  // rewrite rule is installed, and then a COARSER rollup (by
  // l_returnflag alone) is issued against the RAW lineitem path — the
  // optimizer re-points it at the view, so the executed plan reads
  // |groups| rows instead of the fact table (plan-asserted in
  // MvRewriteSpec; here the oracle proves the rewrite is bit-exact,
  // which only holds because eligible sums travel as DECIMAL(25,6)).
  // -------------------------------------------------------------------
  def mvRewrite(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.MvRewrite
    val factPath = s"$dir/lineitem.parquet"
    val mvPath = java.nio.file.Files
      .createTempDirectory("graft_mv").toString + "/li_flag_status"
    MvRewrite.createView(spark, "li_flag_status", factPath, mvPath,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_quantity", "l_extendedprice"),
      minMaxCols = Seq("l_quantity"))
    MvRewrite.install(spark)
    val served = spark.read.parquet(factPath)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(25,6)")).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(25,6)")).cast("double")
          .as("sum_price"),
        count(lit(1)).cast("long").as("n"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy("l_returnflag")
    // materialize the rewritten answer NOW, then de-register: the
    // registration maps this session-shared fact path to a temp-dir
    // view, and leaving it installed would let LATER queries in the
    // same session be served from a snapshot they know nothing about
    val out = Par.pinLocal(served)
    graft.plans.MvRewrite.MvCatalog.clear()
    out
  }

  val mvRewriteSql: String =
    """SELECT l_returnflag,
      | CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
      | count(*) AS n, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // GROUPING SETS — the general form behind rollup/cube (both already
  // covered): three explicit granularities in ONE pass via Catalyst's
  // Expand, not three scans. Data statuses/priorities are non-null, so
  // output NULLs unambiguously mark rolled-up levels.
  // -------------------------------------------------------------------
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        | count(1) AS n,
        | sum(cast(floor(o_totalprice * 100) as bigint)) AS cents
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin)
  }

  val aggGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | count(1) AS n,
      | CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
      .stripMargin

  // -------------------------------------------------------------------
  // Per-user EWMA (alpha = 0.5) over event values in time order — the
  // decayed-average feature of behavioral pipelines. The fold runs
  // over each user's TS-ORDERED COLLECTED ARRAY (sort_array of
  // (ts, id, v) structs), because array folds are left-to-right in
  // both engines; a windowed running aggregate would be at the mercy
  // of the engine's internal evaluation order (DuckDB's segment trees
  // re-associate float sums). One shuffle on user_id; per-user arrays
  // are session-sized. Dyadic alpha keeps every decay weight an exact
  // double.
  // -------------------------------------------------------------------
  def ewmaUser(spark: SparkSession, dir: String): DataFrame = {
    val ev = Par.widen(Tables.load(spark, dir, "events"))
    ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsu"), // micro ticks, not cast-to-seconds
        col("value").cast("double").as("v"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        expr(
          """aggregate(
            |  sort_array(collect_list(struct(tsu, event_id, v))),
            |  cast(0.0 as double),
            |  (acc, e) -> acc * 0.5 + e.v * 0.5)""".stripMargin)
          .as("ewma"))
      .orderBy("user_id")
  }

  val ewmaUserSql: String =
    """SELECT user_id, count(*) AS n,
      | list_reduce(
      |   list_prepend(CAST(0.0 AS DOUBLE),
      |     list(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), event_id)),
      |   (acc, v) -> acc * 0.5 + v * 0.5) AS ewma
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------------
  // Exact-sums Pearson correlation per group: Spark's corr() merges
  // float moments in partition order (results drift with parallelism);
  // here the five sufficient statistics are EXACT integer/decimal sums
  // (values in cents, cross/square terms through DECIMAL(38,0)), so
  // the correlation is one deterministic double expression over exact
  // inputs — identical at any parallelism, and replayable by the
  // oracle. One partial-agg shuffle; nothing else.
  // -------------------------------------------------------------------
  def corrExact(spark: SparkSession, dir: String): DataFrame = {
    val li = Par.widen(Tables.load(spark, dir, "lineitem"))
      .select(col("l_returnflag"),
        floor(col("l_quantity") * 100).cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"))
    li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .select(col("l_returnflag"), col("n"),
        expr(
          """(cast(n as double) * cast(sxy as double)
            | - cast(sx as double) * cast(sy as double))
            |/ sqrt((cast(n as double) * cast(sxx as double)
            |        - cast(sx as double) * cast(sx as double))
            |       * (cast(n as double) * cast(syy as double)
            |          - cast(sy as double) * cast(sy as double)))"""
            .stripMargin).as("corr"))
      .orderBy("l_returnflag")
  }

  val corrExactSql: String =
    """WITH b AS (SELECT l_returnflag,
      |  CAST(floor(l_quantity * 100) AS BIGINT) AS x,
      |  CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
      | FROM lineitem),
      |s AS (SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |  sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
      |  sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
      |  sum(CAST(y AS DECIMAL(38,0)) * y) AS syy
      | FROM b GROUP BY 1)
      |SELECT l_returnflag, n,
      | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      | / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
      |FROM s ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // Incremental distinct-count MV via mergeable HLL states
  // (MaterializedAgg.distinctState/Merge/Finish): the base splits into
  // disjoint batches whose sketch states merge by max-per-register
  // union — the lone classic aggregate with no exact mergeable form.
  // The emitted row proves the two properties that ARE invariant:
  // (a) merge-ORDER independence — merge(merge(a,b),c) and
  // merge(a,merge(b,c)) estimate identically, because register union
  // is associative/commutative; and (b) the merged estimate lands
  // within 5% of the true distinct count. Deliberately NOT asserted:
  // merged estimate == single-pass estimate — DataSketches HLL keeps a
  // per-stream HIP estimator a union cannot preserve, so that equality
  // flips with partition count (false at 32 cores, true at 4). An
  // incremental MV only ever merges states, so order-independence is
  // the contract that matters.
  // -------------------------------------------------------------------
  def hllMvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.MaterializedAgg
    val o = Par.widen(Tables.load(spark, dir, "orders"))
      .select(col("o_orderpriority").as("prio"), col("o_custkey"))
    val keys = Seq("prio")
    // three disjoint ingest batches, split on a key-derived residue
    val parts = (0 until 3).map(r => o.where(pmod(col("o_custkey"), lit(3))
      === r))
    val st = parts.map(MaterializedAgg.distinctState(_, keys, "o_custkey"))
    // two different merge groupings of the SAME three states
    val leftAssoc = MaterializedAgg.distinctMerge(keys,
      MaterializedAgg.distinctMerge(keys, st(0), st(1)), st(2))
    val rightAssoc = MaterializedAgg.distinctMerge(keys,
      st(0), MaterializedAgg.distinctMerge(keys, st(1), st(2)))
      .withColumnRenamed("mv_hll", "hll_right")
    val exact = o.groupBy("prio")
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    MaterializedAgg.distinctFinish(leftAssoc)
      .join(rightAssoc, keys).join(exact, keys)
      .select(col("prio"), col("n_exact"),
        (col("n_est") === hll_sketch_estimate(col("hll_right")))
          .as("merge_order_invariant"),
        (abs(col("n_est") - col("n_exact")) * 20 <= col("n_exact"))
          .as("within_5pct"))
      .orderBy("prio")
  }

  val hllMvDistinctSql: String =
    """SELECT o_orderpriority AS prio,
      | count(DISTINCT o_custkey) AS n_exact,
      | TRUE AS merge_order_invariant, TRUE AS within_5pct
      |FROM orders GROUP BY 1 ORDER BY prio""".stripMargin

  // -------------------------------------------------------------------
  // Format round-trip (sources/Sources.scala: JsonSource, OrcSource,
  // CsvSource): the derived fact (integer-ized values and epoch ticks —
  // JSON and CSV are lossy timestamp carriers, so timestamps travel as
  // integers by design, see JsonSource scaladoc) is written to CSV,
  // JSON-lines and ORC, read back through the declarative Source
  // descriptors, and checksummed per format. All three rows must carry
  // the SAME checksums, and the oracle recomputes them from the
  // original table — a lossy writer/reader pair cannot hide.
  // -------------------------------------------------------------------
  def formatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{CsvSource, JsonSource, OrcSource}
    import org.apache.spark.sql.types._
    val base = Tables.load(spark, dir, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      floor(col("value") * 1e6).cast("long").as("value_u"),
      (unix_micros(col("ts")) % 1000000007L).as("tsu_mod"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_fmt").toString
    base.write.option("header", "true").csv(s"$root/csv")
    base.write.json(s"$root/json")
    base.write.orc(s"$root/orc")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value_u", LongType), StructField("tsu_mod", LongType)))
    val reads = Seq(
      "csv" -> CsvSource(s"$root/csv", schema = Some(schema)).read(spark),
      "json" -> JsonSource(s"$root/json", Some(schema)).read(spark),
      "orc" -> OrcSource(s"$root/orc").read(spark))
    reads.map { case (fmt, df) =>
      df.agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("s_id"), sum(col("user_id")).as("s_uid"),
        sum(col("value_u")).as("s_val"), sum(col("tsu_mod")).as("s_ts"))
        .select(lit(fmt).as("format"), col("n"), col("s_id"),
          col("s_uid"), col("s_val"), col("s_ts"))
    }.reduce(_.unionByName(_)).orderBy("format")
  }

  val formatRoundtripSql: String =
    """WITH s AS (SELECT count(*) AS n,
      |  CAST(sum(event_id) AS BIGINT) AS s_id,
      |  CAST(sum(user_id) AS BIGINT) AS s_uid,
      |  CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS s_val,
      |  CAST(sum(epoch_us(ts) % 1000000007) AS BIGINT) AS s_ts
      | FROM events)
      |SELECT f.format, s.n, s.s_id, s.s_uid, s.s_val, s.s_ts
      |FROM (VALUES ('csv'), ('json'), ('orc')) f(format), s
      |ORDER BY format""".stripMargin

  // -------------------------------------------------------------------
  // Association rules over order baskets (market-basket co-occurrence):
  // support / directional confidence / lift for part pairs bought
  // together in >= minSup orders. Apriori monotonicity prunes FIRST —
  // an item below minSup cannot form a frequent pair, so the basket
  // self-join runs over frequent items only (the classic candidate-
  // pruning win; on this corpus it cuts the pair space ~40x).
  //
  // 100 TB shape: baskets shuffle once on the order key; the pair
  // explosion is bounded by the square of BASKET size (bounded small
  // by nature), never corpus size; item supports are a small aggregate
  // broadcast back into the rule projection. Ratios are IEEE double
  // divisions of exact integer counts — engine-identical.
  // -------------------------------------------------------------------
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    val minSup = 3L
    val li = Par.widen(Tables.load(spark, dir, "lineitem"))
    val b = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val items = b.groupBy("p").agg(count(lit(1)).as("n_item"))
    val frequent = items.where(col("n_item") >= minSup)
    val fb = b.join(broadcast(frequent), "p") // apriori pruning
    val pairs = fb.as("a")
      .join(fb.as("c"), col("a.o") === col("c.o") &&
        col("a.p") < col("c.p"))
      .groupBy(col("a.p").as("pa"), col("c.p").as("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSup)
    val total = Par.pinLocal(b.select(col("o")).distinct()
      .agg(count(lit(1)).as("n_orders")))
    pairs
      .join(broadcast(frequent.select(col("p").as("pa"),
        col("n_item").as("n_a"))), "pa")
      .join(broadcast(frequent.select(col("p").as("pb"),
        col("n_item").as("n_b"))), "pb")
      .crossJoin(broadcast(total))
      .select(col("pa"), col("pb"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_ab"),
        (col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_ba"),
        // operands cast BEFORE multiplying: long products of corpus-
        // scale counts overflow int64 (ANSI would throw)
        ((col("n_ab").cast("double") * col("n_orders").cast("double"))
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
      .orderBy("pa", "pb")
  }

  val assocRulesSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |items AS (SELECT p, count(*) AS n_item FROM b GROUP BY 1),
      |freq AS (SELECT p, n_item FROM items WHERE n_item >= 3),
      |fb AS (SELECT b.o, b.p FROM b JOIN freq USING (p)),
      |pairs AS (SELECT a.p AS pa, c.p AS pb, count(*) AS n_ab
      | FROM fb a JOIN fb c ON a.o = c.o AND a.p < c.p
      | GROUP BY 1, 2 HAVING count(*) >= 3),
      |t AS (SELECT count(DISTINCT o) AS n_orders FROM b)
      |SELECT pa, pb, n_ab,
      | CAST(n_ab AS DOUBLE) / CAST(fa.n_item AS DOUBLE) AS conf_ab,
      | CAST(n_ab AS DOUBLE) / CAST(fb2.n_item AS DOUBLE) AS conf_ba,
      | (CAST(n_ab AS DOUBLE) * CAST(t.n_orders AS DOUBLE))
      |   / (CAST(fa.n_item AS DOUBLE) * CAST(fb2.n_item AS DOUBLE)) AS lift
      |FROM pairs JOIN freq fa ON fa.p = pairs.pa
      |JOIN freq fb2 ON fb2.p = pairs.pb, t
      |ORDER BY pa, pb""".stripMargin

  // -------------------------------------------------------------------
  // Mergeable-histogram percentile MV (MaterializedAgg.histState/
  // Merge/Percentiles): the OTHER classic non-mergeable aggregate,
  // carried as exact per-bucket integer counts whose merge is
  // element-wise sum — split-invariant by construction, and unlike a
  // sketch the interpolated estimate is a deterministic double
  // expression over exact counts, so the oracle REPLAYS it bit-for-bit
  // (no tolerance band needed). Three disjoint ingest batches merge
  // into the p50/p95 of order totals per priority.
  // -------------------------------------------------------------------
  def histMvPercentile(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.MaterializedAgg
    val (lo, hi, nb) = (0.0, 500000.0, 64)
    val o = Par.widen(Tables.load(spark, dir, "orders"))
      .select(col("o_orderpriority").as("prio"), col("o_totalprice"))
    val parts = (0 until 3).map(r =>
      o.where(pmod(col("o_totalprice").cast("long"), lit(3)) === r))
    val merged = MaterializedAgg.histMerge(Seq("prio"),
      parts.map(MaterializedAgg.histState(_, Seq("prio"),
        "o_totalprice", lo, hi, nb)): _*)
    MaterializedAgg.histPercentiles(merged, Seq("prio"), lo, hi, nb,
      Seq(0.5, 0.95))
      .orderBy("prio", "p")
  }

  val histMvPercentileSql: String =
    """WITH b AS (SELECT o_orderpriority AS prio,
      |  CAST(least(greatest(floor((o_totalprice - 0.0) / 7812.5), 0.0),
      |             63.0) AS INT) AS bk
      | FROM orders WHERE o_totalprice IS NOT NULL),
      |c AS (SELECT prio, bk, count(*) AS n FROM b GROUP BY 1, 2),
      |cum AS (SELECT prio, bk, n,
      |  sum(n) OVER (PARTITION BY prio ORDER BY bk) AS cum,
      |  sum(n) OVER (PARTITION BY prio) AS tot FROM c),
      |ps AS (SELECT unnest([0.5, 0.95]) AS p)
      |SELECT prio, p, CAST(tot AS BIGINT) AS n_rows,
      | 0.0 + 7812.5 * (CAST(bk AS DOUBLE)
      |   + CAST(CAST(ceil(p * tot) AS BIGINT) - (cum - n) AS DOUBLE)
      |     / CAST(n AS DOUBLE)) AS estimate
      |FROM cum, ps
      |WHERE cum >= CAST(ceil(p * tot) AS BIGINT)
      |  AND (cum - n) < CAST(ceil(p * tot) AS BIGINT)
      |ORDER BY prio, p""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q1, the canonical pricing summary, faithful shape: returned/
  // status grouping over shipped-before-cutoff lineitems with the
  // three derived charge sums, three averages and a count. One scan,
  // one partial-agg shuffle; sums via the associative decimal idiom,
  // averages as double divisions of those exact sums (the engine-
  // portable form of Q1's avg columns).
  // -------------------------------------------------------------------
  def tpchQ1(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    def dsum(c: Column) = Queries.dsum(c)
    val agg = li.where(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        dsum(col("l_discount")).as("sum_disc"),
        count(lit(1)).as("count_order"))
    agg.select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
        col("sum_charge"),
        (col("sum_qty") / col("count_order").cast("double")).as("avg_qty"),
        (col("sum_base_price") / col("count_order").cast("double"))
          .as("avg_price"),
        (col("sum_disc") / col("count_order").cast("double"))
          .as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val tpchQ1Sql: String =
    """WITH a AS (SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
      | CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc,
      | count(*) AS count_order
      | FROM lineitem WHERE l_shipdate <= CAST('1998-09-02' AS DATE)
      | GROUP BY 1, 2)
      |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
      | sum_disc_price, sum_charge,
      | sum_qty / CAST(count_order AS DOUBLE) AS avg_qty,
      | sum_base_price / CAST(count_order AS DOUBLE) AS avg_price,
      | sum_disc / CAST(count_order AS DOUBLE) AS avg_disc,
      | count_order
      |FROM a ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q3 (shipping priority), adapted to this schema
  // (o_orderpriority for the absent o_shippriority): the canonical
  // 3-way star join + group + top-k. Plan shape at scale: customer
  // (filtered to one segment) BROADCASTS into orders, the filtered
  // join result shuffles once on l_orderkey for the aggregate, and the
  // top-10 is a TakeOrdered, never a global sort. Revenue sums ride
  // the DECIMAL(25,6) associative carrier (Queries.dsum); ordering is
  // fully deterministic (revenue desc, date, orderkey).
  // -------------------------------------------------------------------
  def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-15").cast("timestamp")
    val c = Tables.load(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(Queries.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val tpchQ3Sql: String =
    """SELECT l_orderkey,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |               AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      | o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-15'
      |  AND l_shipdate > TIMESTAMP '1998-06-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q6 (forecasting revenue change): the canonical selective
  // scan-and-sum. Every predicate reaches the parquet scan as a pushed
  // filter; the revenue product sums through the decimal carrier. The
  // 100 TB story is the SCAN, not the agg: shipdate range + discount
  // band + quantity cut prune row groups via parquet min/max before a
  // single value is decoded.
  // -------------------------------------------------------------------
  def tpchQ6(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    l.where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        Queries.dsum(col("l_extendedprice") * col("l_discount"))
          .as("revenue"),
        count(lit(1)).as("n"))
  }

  val tpchQ6Sql: String =
    """SELECT
      | CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(25,6)))
      |      AS DOUBLE) AS revenue,
      | count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q5 (local supplier volume): the full six-table star — the
  // only query family touching nation/region — with the canonical
  // same-nation customer⋈supplier condition. Plan shape at scale:
  // region/nation/supplier/customer all broadcast (each orders of
  // magnitude under the fact); lineitem⋈orders is the one real
  // shuffle; the same-nation predicate rides the join, never a
  // post-filter over a wider product.
  // -------------------------------------------------------------------
  def tpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val r = Tables.load(spark, dir, "region")
      .where(col("r_name") === "ASIA").select("r_regionkey")
    val n = Tables.load(spark, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val s = Tables.load(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
    val c = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val l = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Queries.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val tpchQ5Sql: String =
    """SELECT n_name,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |               AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |              AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q10 (returned item reporting): revenue lost to returned
  // items per customer over a quarter, top 20. The quarter-filtered
  // orders⋈lineitem(R) is the one real shuffle; customer and nation
  // broadcast; the top-20 is a TakeOrdered with a deterministic
  // (revenue desc, custkey) order.
  // -------------------------------------------------------------------
  def tpchQ10(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val c = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey",
        "c_mktsegment")
    val n = Tables.load(spark, dir, "nation")
      .select("n_nationkey", "n_name")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val l = Tables.load(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        floor(col("c_acctbal") * 100).cast("long").as("acctbal_cents"),
        col("n_name"), col("c_mktsegment"))
      .agg(Queries.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val tpchQ10Sql: String =
    """SELECT c_custkey, c_name,
      | CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
      | n_name, c_mktsegment,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |               AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, acctbal_cents, n_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q4 (order priority checking), the correlated-EXISTS shape:
  // count a quarter's orders having at least one qualifying lineitem.
  // The canonical commit/receipt-date lateness predicate is re-expressed
  // over this dataset's columns (l_shipdate > o_orderdate — shipped
  // after the order was placed) keeping the EXACT subquery form: an
  // EXISTS correlated on the join key PLUS a non-equi comparison
  // between the two tables. The plan this must (and does) produce is a
  // LEFT SEMI hash join on l_orderkey with the non-equi predicate as
  // the join's extra condition — never a cartesian, never an aggregate-
  // then-join-back. At 100 TB the semi join is the whole story: the
  // probe stops at a lineitem's FIRST match per order (no fan-out, no
  // dedup), and the quarter filter prunes orders at the parquet scan
  // before the shuffle. Pinned in PlanShapeSpec.
  // -------------------------------------------------------------------
  def tpchQ4(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_shipdate")
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val tpchQ4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q21 (suppliers who kept orders waiting), the DOUBLE
  // correlation: EXISTS + NOT EXISTS against the same fact at
  // different predicates. Canonical form: on finished multi-supplier
  // orders, find the supplier whose lineitem was the SOLE fault.
  // "Late" is re-expressed as l_returnflag = 'R' (the dataset has no
  // receipt/commit dates): l1 is a returned line, EXISTS another
  // supplier's line on the same order (multi-supplier), NOT EXISTS
  // another supplier's RETURNED line (sole fault). Plan shape: one
  // LEFT SEMI + one LEFT ANTI hash join on l_orderkey — Catalyst keeps
  // the `l2_suppkey <> l_suppkey` disequality as the join's extra
  // condition, so neither subquery becomes a cartesian or a per-order
  // aggregate. At 100 TB all three lineitem legs partition on
  // l_orderkey (one co-partitioned shuffle family); supplier and the
  // nation filter broadcast. Pinned in PlanShapeSpec.
  // -------------------------------------------------------------------
  def tpchQ21(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(spark, dir, "nation")
      .where(col("n_name") === "NATION_3").select("n_nationkey")
    val s = Tables.load(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderstatus") === "F").select("o_orderkey")
    val l1 = Tables.load(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey")
    val l2 = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
    val l3 = Tables.load(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"))
    l1.join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(l2, col("l2_orderkey") === col("l_orderkey") &&
        col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("l3_orderkey") === col("l_orderkey") &&
        col("l3_suppkey") =!= col("l_suppkey"), "left_anti")
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val tpchQ21Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE l1.l_returnflag = 'R'
      |  AND n_name = 'NATION_3'
      |  AND EXISTS (SELECT 1 FROM orders
      |              WHERE o_orderkey = l1.l_orderkey
      |                AND o_orderstatus = 'F')
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q22 (global sales opportunity), NOT EXISTS + scalar-average
  // subquery: well-funded customers (balance above the positive-balance
  // average of their segment pool) with no OPEN order. The canonical
  // "never ordered" predicate is empty on this dataset (every customer
  // has orders), so the NOT EXISTS carries the o_orderstatus='O'
  // condition instead — same correlated-anti shape, non-trivial answer.
  // The phone-prefix filter is re-expressed over c_mktsegment.
  // Cross-engine
  // exactness: balances travel as integer CENTS and the average
  // comparison is cleared of division entirely — `cents * n > sum`
  // over BIGINTs is exact in both engines where `cents > avg` would
  // hinge on a double's final ulp. Plan shape: the threshold is a
  // 1-row broadcast (scalar agg, J4 pattern), the NOT EXISTS is a
  // LEFT ANTI hash join on o_custkey, and at 100 TB that anti join is
  // the only shuffle — customer-sized, not orders-sized, since the
  // orders side projects to the single join column at the scan.
  // Pinned in PlanShapeSpec.
  // -------------------------------------------------------------------
  def tpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")
    val pool = Tables.load(spark, dir, "customer")
      .where(col("c_mktsegment").isin(segs: _*))
      .select(col("c_custkey"), col("c_mktsegment"),
        floor(col("c_acctbal") * 100).cast("long").as("cents"))
    val thresh = pool.where(col("cents") > 0)
      .agg(sum(col("cents")).cast("long").as("s"),
        count(lit(1)).as("n"))
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderstatus") === "O").select("o_custkey")
    pool.crossJoin(broadcast(thresh))
      .where(col("cents") * col("n") > col("s"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("cents")).cast("long").as("totacctbal_cents"))
      .orderBy(col("c_mktsegment"))
  }

  val tpchQ22Sql: String =
    """WITH pool AS (
      |  SELECT c_custkey, c_mktsegment,
      |         CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer
      |  WHERE c_mktsegment IN ('AUTOMOBILE','BUILDING','MACHINERY')),
      |thresh AS (
      |  SELECT CAST(sum(cents) AS BIGINT) AS s, count(*) AS n
      |  FROM pool WHERE cents > 0)
      |SELECT c_mktsegment, count(*) AS numcust,
      |       CAST(sum(cents) AS BIGINT) AS totacctbal_cents
      |FROM pool, thresh
      |WHERE cents * n > s
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderstatus = 'O')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q13 (customer distribution), aggregate-of-aggregate over a
  // LEFT OUTER join with an ON-clause filter on the NULLABLE side —
  // the shape where pushing the predicate into WHERE would be WRONG
  // (it would drop order-less customers instead of zeroing their
  // count). The comment-pattern exclusion is re-expressed as
  // o_orderpriority <> '1-URGENT'. count(o_orderkey) counts non-NULL
  // matches, so excluded-only customers land in the c_count=0 bucket.
  // Plan shape at scale: the outer join shuffles both sides on the
  // custkey ONCE and the per-customer count reuses that partitioning
  // (no second customer-sized exchange — Catalyst sees the groupBy key
  // equals the join key); the distribution agg is priority-bucket
  // sized. Exchange count pinned in PlanShapeSpec.
  // -------------------------------------------------------------------
  def tpchQ13(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer").select("c_custkey")
    // the ON-clause filter: restrict the RIGHT side before the outer
    // join (equivalent to AND in ON for a left join, and lets the
    // predicate reach the orders scan)
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val tpchQ13Sql: String =
    """WITH c_orders AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey
      |   AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q12 (shipping modes and order priority): conditional
  // aggregation (CASE WHEN sums) over the orders⋈lineitem fact join.
  // The dataset has no l_shipmode/l_commitdate/l_receiptdate, so the
  // mode column is re-expressed as l_returnflag and the late-delivery
  // predicate as a one-year l_shipdate window — the SHAPE is what
  // matters: both CASE branches ride one join, not two passes.
  // Plan shape at scale: the l_shipdate + returnflag filters reach the
  // lineitem scan (PushedFilters), lineitem projects to two columns
  // before the shuffle, and orders projects to (o_orderkey,
  // o_orderpriority) — the join shuffles only those thin sides on
  // o_orderkey, and the final agg is 2 groups. The CASE WHEN pair
  // costs zero extra passes over the fact.
  // -------------------------------------------------------------------
  def tpchQ12(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val l = Tables.load(spark, dir, "lineitem")
      .where(col("l_returnflag").isin("R", "A") &&
        col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select("l_orderkey", "l_returnflag")
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val high = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val tpchQ12Sql: String =
    """SELECT l_returnflag,
      | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |          THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_returnflag IN ('R','A')
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // Derived PARTSUPP: the test tables omit TPC-H's partsupp, so the
  // five queries that need it (Q2, Q9, Q11, Q16, Q20) DERIVE it —
  // identically in Spark and in the DuckDB oracle — from the distinct
  // (l_partkey, l_suppkey) pairs lineitem actually references (the
  // same FK closure dbgen guarantees: every pair resolves to a part
  // and a supplier, verified 0 orphans), with availqty / supplycost as
  // pure integer arithmetic on the keys. No randomness and no
  // engine-specific function: the derivation is PART OF THE QUERY on
  // both sides, so the strict hash oracle still gates every output
  // row. Cost: one two-column distinct with map-side combine; a real
  // deployment would materialize it once.
  // -------------------------------------------------------------------
  private def partsuppOf(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty",
        (col("ps_partkey") * 7 + col("ps_suppkey") * 11) % 9999 + 1)
      .withColumn("ps_supplycost_cents",
        (col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 100000 + 100)

  private val PartsuppCte: String =
    """partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |         (ps_partkey*7 + ps_suppkey*11) % 9999 + 1 AS ps_availqty,
      |         (ps_partkey*31 + ps_suppkey*17) % 100000 + 100 AS ps_supplycost_cents
      |  FROM (SELECT DISTINCT l_partkey AS ps_partkey,
      |               l_suppkey AS ps_suppkey FROM lineitem))""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q2 (minimum-cost supplier): the correlated scalar-MIN
  // subquery, decorrelated Spark-side into a per-part MIN aggregate
  // joined back on (part, cost) — Catalyst's own rewrite for this
  // shape, stated explicitly so the regional slice is computed ONCE
  // and reused for both legs. Plan shape at scale: region→nation→
  // supplier collapses to a broadcast before touching partsupp, the
  // filtered part slice broadcasts, and the only real shuffle is the
  // per-part MIN + its join back — both keyed on ps_partkey, so AQE
  // coalesces them into one exchange family. The full ORDER BY key
  // (acctbal, nation, supplier, part) is a total order — LIMIT 100 is
  // deterministic.
  // -------------------------------------------------------------------
  def tpchQ2(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(spark, dir, "region")
      .where(col("r_name") === "EUROPE").select("r_regionkey")
    val n = Tables.load(spark, dir, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val s = Tables.load(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val regional = partsuppOf(spark, dir)
      .join(broadcast(s), col("ps_suppkey") === col("s_suppkey"))
    val minCost = regional
      .groupBy(col("ps_partkey").as("mc_partkey"))
      .agg(min(col("ps_supplycost_cents")).as("mc_cents"))
    val p = Tables.load(spark, dir, "part")
      .where(col("p_size") <= 10 && col("p_type") === "STANDARD")
      .select("p_partkey", "p_brand")
    regional
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(minCost, col("ps_partkey") === col("mc_partkey") &&
        col("ps_supplycost_cents") === col("mc_cents"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("ps_supplycost_cents"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  val tpchQ2Sql: String =
    s"""WITH $PartsuppCte,
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier, nation, region
      |  WHERE s_nationkey = n_nationkey
      |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'),
      |regional AS (
      |  SELECT * FROM partsupp JOIN eu ON ps_suppkey = s_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
      |       ps_supplycost_cents
      |FROM part, regional
      |WHERE p_partkey = ps_partkey
      |  AND p_size <= 10 AND p_type = 'STANDARD'
      |  AND ps_supplycost_cents = (
      |    SELECT min(ps_supplycost_cents) FROM regional r2
      |    WHERE r2.ps_partkey = regional.ps_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q9 (product-type profit): the six-table star on BOTH fact
  // foreign keys — lineitem joins partsupp on the COMPOSITE
  // (partkey, suppkey). Profit decomposes into two exact sums instead
  // of one divided value (revenue via the DECIMAL(25,6) carrier, cost
  // as BIGINT cents×quantity — quantities are integral), so no
  // division ever happens inside the aggregate and the hash compare
  // is exact. Plan shape at scale: the part-name slice broadcasts
  // into BOTH lineitem and partsupp before their composite-key
  // shuffle; supplier→nation broadcasts; lineitem⋈orders is the one
  // fact-fact shuffle.
  // -------------------------------------------------------------------
  def tpchQ9(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .where(col("p_name").like("red%")).select("p_partkey")
    val ps = partsuppOf(spark, dir)
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .select("ps_partkey", "ps_suppkey", "ps_supplycost_cents")
    val li = Tables.load(spark, dir, "lineitem")
      .join(broadcast(p).withColumnRenamed("p_partkey", "pp"),
        col("l_partkey") === col("pp"))
      .select("l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity")
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate")
    val s = Tables.load(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
    val n = Tables.load(spark, dir, "nation")
      .select("n_nationkey", "n_name")
    li.join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(
        Queries.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_revenue"),
        sum(col("ps_supplycost_cents") * col("l_quantity").cast("long"))
          .as("cost_cents"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val tpchQ9Sql: String =
    s"""WITH $PartsuppCte
      |SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |               AS DECIMAL(25,6))) AS DOUBLE) AS sum_revenue,
      | CAST(sum(ps_supplycost_cents * CAST(l_quantity AS BIGINT)) AS BIGINT) AS cost_cents
      |FROM lineitem
      |JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      |JOIN part ON p_partkey = l_partkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE p_name LIKE 'red%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q11 (important stock): GROUP BY + HAVING against a scalar
  // subquery over the SAME aggregate. The fraction threshold is
  // integer-exact: part_value*10000 > nation_total instead of
  // total*0.0001 — no float ever enters the comparison. Plan shape:
  // the nation's suppliers broadcast into partsupp; the per-part SUM
  // and the grand total share one scan (the total is a 1-row
  // broadcast, the J4 idiom); one shuffle on ps_partkey.
  // -------------------------------------------------------------------
  def tpchQ11(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(spark, dir, "nation")
      .where(col("n_name") === "NATION_3").select("n_nationkey")
    val s = Tables.load(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val scoped = partsuppOf(spark, dir)
      .join(broadcast(s), col("ps_suppkey") === col("s_suppkey"))
      .withColumn("v", col("ps_supplycost_cents") * col("ps_availqty"))
    val total = scoped.agg(sum(col("v")).as("total_cents"))
    scoped.groupBy(col("ps_partkey"))
      .agg(sum(col("v")).as("value_cents"))
      .crossJoin(broadcast(total))
      .where(col("value_cents") * 10000 > col("total_cents"))
      .select("ps_partkey", "value_cents")
      .orderBy(col("value_cents").desc, col("ps_partkey"))
  }

  val tpchQ11Sql: String =
    s"""WITH $PartsuppCte,
      |scoped AS (
      |  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v
      |  FROM partsupp, supplier, nation
      |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_name = 'NATION_3')
      |SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
      |FROM scoped
      |GROUP BY ps_partkey
      |HAVING sum(v) * 10000 > (SELECT sum(v) FROM scoped)
      |ORDER BY value_cents DESC, ps_partkey""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q16 (parts/supplier relationship): COUNT(DISTINCT) per
  // attribute group with a NOT IN anti-subquery on the supplier dim
  // (canonical "complaints" predicate re-expressed as s_acctbal < 0 —
  // the dataset has no s_comment; negative balances exist). Plan
  // shape: the excluded-supplier set is tiny and broadcasts as a
  // LEFT ANTI; part attributes broadcast into partsupp; the distinct
  // count shuffles once on the (brand, type, size) group key.
  // -------------------------------------------------------------------
  def tpchQ16(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.load(spark, dir, "supplier")
      .where(col("s_acctbal") < 0).select("s_suppkey")
    val p = Tables.load(spark, dir, "part")
      .where(col("p_brand") =!= "Brand#45" &&
        !col("p_type").like("MEDIUM%") &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    partsuppOf(spark, dir)
      .join(broadcast(excluded),
        col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"),
        col("p_type"), col("p_size"))
  }

  val tpchQ16Sql: String =
    s"""WITH $PartsuppCte
      |SELECT p_brand, p_type, p_size,
      |       count(DISTINCT ps_suppkey) AS supplier_cnt
      |FROM partsupp, part
      |WHERE p_partkey = ps_partkey
      |  AND p_brand <> 'Brand#45'
      |  AND p_type NOT LIKE 'MEDIUM%'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND ps_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q20 (potential part promotion): the nested IN chain with a
  // correlated scalar-SUM subquery — suppliers of 'red' parts whose
  // stock exceeds half of one year's shipped quantity for that exact
  // (part, supplier) pair. The half is integer-exact:
  // 2*ps_availqty > sum(qty) instead of availqty > 0.5*sum. Spark-side
  // the correlation decorrelates into a per-(part,supplier) aggregate
  // of the year's lineitems joined back on the composite key; the
  // outer IN chains become LEFT SEMI joins. Plan shape: part slice
  // and region's suppliers broadcast; the shipped-quantity aggregate
  // and its join share the composite-key partitioning.
  // -------------------------------------------------------------------
  def tpchQ20(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val p = Tables.load(spark, dir, "part")
      .where(col("p_name").like("red%")).select("p_partkey")
    val shipped = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("shipped_qty"))
    val qualifying = partsuppOf(spark, dir)
      .join(broadcast(p).withColumnRenamed("p_partkey", "pp"),
        col("ps_partkey") === col("pp"))
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .where(col("ps_availqty") * 2 > col("shipped_qty"))
      .select("ps_suppkey")
    val r = Tables.load(spark, dir, "region")
      .where(col("r_name") === "EUROPE").select("r_regionkey")
    val n = Tables.load(spark, dir, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    Tables.load(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("n_name"),
        floor(col("s_acctbal") * 100).cast("long").as("acctbal_cents"))
      .orderBy(col("s_name"))
  }

  val tpchQ20Sql: String =
    s"""WITH $PartsuppCte
      |SELECT s_name, n_name,
      |       CAST(floor(s_acctbal * 100) AS BIGINT) AS acctbal_cents
      |FROM supplier, nation, region
      |WHERE s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |  AND s_suppkey IN (
      |    SELECT ps_suppkey FROM partsupp
      |    WHERE ps_partkey IN (
      |        SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |      AND ps_availqty * 2 > (
      |        SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem
      |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |          AND l_shipdate >= TIMESTAMP '1996-01-01'
      |          AND l_shipdate < TIMESTAMP '1997-01-01'))
      |ORDER BY s_name""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q7 (volume shipping): bidirectional two-nation trade by ship
  // year. Plan shape at scale: the nation filter COLLAPSES the
  // supplier and customer dims before they touch the facts — supplier
  // joined to its (2-row) nation slice broadcasts into lineitem,
  // customer's slice broadcasts into orders, so the only real shuffle
  // is lineitem⋈orders, and the either-direction pair disjunction runs
  // over rows already restricted to the two nations. Revenue rides the
  // DECIMAL(25,6) carrier; year() is engine-identical on timestamps.
  // -------------------------------------------------------------------
  def tpchQ7(spark: SparkSession, dir: String): DataFrame = {
    val nats = Seq("NATION_1", "NATION_2")
    val n1 = Tables.load(spark, dir, "nation")
      .where(col("n_name").isin(nats: _*))
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.load(spark, dir, "nation")
      .where(col("n_name").isin(nats: _*))
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    val s = Tables.load(spark, dir, "supplier")
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .select("s_suppkey", "supp_nation")
    val c = Tables.load(spark, dir, "customer")
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .select("c_custkey", "cust_nation")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val l = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
    l.join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .where((col("supp_nation") === "NATION_1" &&
        col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" &&
          col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Queries.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val tpchQ7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | CAST(year(l_shipdate) AS INT) AS l_year,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |               AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      |FROM supplier
      |JOIN lineitem ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q8 (national market share): one nation's share of a region's
  // volume in one part type, by order year. The share is a ratio of
  // two decimal-carried sums turned into ONE double division — both
  // engines divide identical operands, so the doubles match bitwise
  // (the [[Queries.dsum]] discipline applied to a CASE'd numerator).
  // Plan shape: the part-type slice, the region's customers and the
  // supplier→nation attribution all broadcast; lineitem⋈orders is the
  // one shuffle.
  // -------------------------------------------------------------------
  def tpchQ8(spark: SparkSession, dir: String): DataFrame = {
    val dec0 = lit(0).cast("decimal(25,6)")
    val p = Tables.load(spark, dir, "part")
      .where(col("p_type") === "ECONOMY").select("p_partkey")
    val r = Tables.load(spark, dir, "region")
      .where(col("r_name") === "AFRICA").select("r_regionkey")
    val n1 = Tables.load(spark, dir, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("n1_key"))
    val c = Tables.load(spark, dir, "customer")
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .select("c_custkey")
    val n2 = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
    val s = Tables.load(spark, dir, "supplier")
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .select("s_suppkey", "supp_nation")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(25,6)")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_5", vol).otherwise(dec0))
          .cast("double") / sum(vol).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  val tpchQ8Sql: String =
    """WITH vol AS (
      | SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |   CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))
      |     AS volume,
      |   n2.n_name AS supp_nation
      | FROM part
      | JOIN lineitem ON p_partkey = l_partkey
      | JOIN supplier ON s_suppkey = l_suppkey
      | JOIN orders ON o_orderkey = l_orderkey
      | JOIN customer ON c_custkey = o_custkey
      | JOIN nation n1 ON c_nationkey = n1.n_nationkey
      | JOIN region ON n1.n_regionkey = r_regionkey
      | JOIN nation n2 ON s_nationkey = n2.n_nationkey
      | WHERE r_name = 'AFRICA' AND p_type = 'ECONOMY'
      |   AND o_orderdate >= TIMESTAMP '1996-01-01'
      |   AND o_orderdate < TIMESTAMP '1998-01-01')
      |SELECT o_year,
      | CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
      |                    ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
      |   / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
      |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q14 (promotion effect): the percentage of a month's revenue
  // from PROMO parts — a CASE'd numerator over one join, the same
  // decimal-carrier-then-one-division discipline as Q8. No broadcast
  // hint on part: it scales with the fact (AQE broadcasts it at small
  // SF, shuffles on p_partkey when it outgrows the threshold — the
  // adaptive decision IS the 100 TB plan).
  // -------------------------------------------------------------------
  def tpchQ14(spark: SparkSession, dir: String): DataFrame = {
    val dec0 = lit(0).cast("decimal(25,6)")
    val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast("decimal(25,6)")
    val p = Tables.load(spark, dir, "part").select("p_partkey", "p_type")
    val l = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        sum(when(col("p_type") === "PROMO", vol).otherwise(dec0))
          .cast("double") / sum(vol).cast("double")).as("promo_revenue"))
  }

  val tpchQ14Sql: String =
    """SELECT
      | CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |     THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))
      |     ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
      |   / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |                   AS DECIMAL(25,6))) AS DOUBLE) AS DOUBLE)
      |   AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q15 (top supplier): suppliers whose quarter revenue EQUALS
  // the maximum — a scalar subquery over a derived view. The equality
  // is taken on the DECIMAL sums (exact; casting to double first could
  // merge near-ties), presented as double after. Plan shape: one
  // shuffle builds the supplier-revenue view, its 1-row max broadcasts
  // back (J4 pattern), and the supplier join is supplier-sized.
  // -------------------------------------------------------------------
  def tpchQ15(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(25,6)")).as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    val s = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_name")
    rev.crossJoin(broadcast(top))
      .where(col("total_revenue") === col("max_revenue"))
      .join(s, col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val tpchQ15Sql: String =
    """WITH revenue AS (
      | SELECT l_suppkey AS supplier_no,
      |   sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6)))
      |     AS total_revenue
      | FROM lineitem
      | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |   AND l_shipdate < TIMESTAMP '1996-04-01'
      | GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      | CAST(total_revenue AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q17 (small-quantity-order revenue): lineitems under 20% of
  // their part's average quantity — the correlated-scalar-average
  // shape. The 0.2·avg comparison is cleared of division AND floats:
  // quantities are integer-valued, so `qty * 5 * n < sum_qty` over
  // BIGINTs is the exact equivalent both engines compute identically.
  // Spark plans it as aggregate-then-join-back on l_partkey (the
  // scalable decorrelation); the oracle keeps the canonical correlated
  // subqueries and DuckDB decorrelates to the same shape.
  // -------------------------------------------------------------------
  def tpchQ17(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val perPart = l.groupBy(col("l_partkey").as("q_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n_qty"))
    val p = Tables.load(spark, dir, "part")
      .where(col("p_brand") === "Brand#3" && col("p_size") <= 25)
      .select("p_partkey")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("q_partkey"))
      .where(col("l_quantity").cast("long") * 5 * col("n_qty") <
        col("sum_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(25,6)"))
        .cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  val tpchQ17Sql: String =
    """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6)))
      |     AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
      | count(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3' AND p_size <= 25
      |  AND CAST(l_quantity AS BIGINT) * 5 *
      |      (SELECT count(*) FROM lineitem l2
      |       WHERE l2.l_partkey = p_partkey)
      |    < (SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
      |       FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q18 (large-volume customers): orders whose total quantity
  // exceeds a threshold, with customer attribution, top 100 by price.
  // Spark-first shape: ONE aggregation of lineitem by order (its
  // result carries sum_qty), filtered and joined to orders+customer —
  // the canonical SQL's join-back-and-reaggregate second lineitem pass
  // is algebraically redundant and the oracle keeps it (results are
  // equal; the engine just doesn't pay the second scan). Quantities
  // sum exactly as BIGINTs; the top-100 ordering ties break on the
  // unique order key.
  // -------------------------------------------------------------------
  def tpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .where(col("sum_qty") > 150)
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_name")
    o.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        floor(col("o_totalprice") * 100).cast("long")
          .as("totalprice_cents"),
        col("sum_qty"))
      .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  val tpchQ18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey,
      | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      | CAST(floor(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey
      |                     HAVING sum(CAST(l_quantity AS BIGINT)) > 150)
      |GROUP BY 1, 2, 3, 4, 5
      |ORDER BY totalprice_cents DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // -------------------------------------------------------------------
  // TPC-H Q19 (discounted revenue): the DISJUNCTION of conjunctive
  // cross-table predicates — the shape that punishes planners which
  // evaluate the OR after a full join product. The join key is common
  // to all three arms, so the correct plan joins on p_partkey ONCE and
  // evaluates the disjunction as the join's residual condition;
  // per-arm single-table conjuncts (brand, size, quantity bands) still
  // prune their own scans via OR-factoring. Container/shipmode arms
  // are re-expressed over this dataset's brand/size/quantity columns,
  // preserving the three-arm structure. Decimal-carried revenue.
  // -------------------------------------------------------------------
  def tpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .select("p_partkey", "p_brand", "p_size")
    val l = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val arm1 = col("p_brand") === "Brand#1" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#2" &&
      col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#3" &&
      col("p_size").between(1, 35) && col("l_quantity").between(20, 30)
    l.join(p, col("l_partkey") === col("p_partkey") &&
        (arm1 || arm2 || arm3))
      .agg(Queries.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n"))
  }

  val tpchQ19Sql: String =
    """SELECT
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |               AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      | count(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // -------------------------------------------------------------------
  // Distribution window functions (ntile / percent_rank / cume_dist)
  // over a per-group total ordering — the analytic trio w2_rank_funcs
  // doesn't cover. The window ordering includes the key so it is
  // TOTAL: percent_rank and cume_dist become exact rational values
  // (rank-1)/(n-1) and rank/n that both engines evaluate identically
  // as doubles. One exchange on the partition key, no global sort.
  // -------------------------------------------------------------------
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, dir, "orders")
      .where(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("tile4", ntile(4).over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("cents"), col("o_orderkey"))))
      .withColumn("pct_rank", percent_rank().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("cents"), col("o_orderkey"))))
      .withColumn("cume", cume_dist().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("cents"), col("o_orderkey"))))
      .orderBy("o_orderkey")
  }

  val windowDistributionSql: String =
    """SELECT o_orderkey, o_orderpriority,
      | CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      | CAST(ntile(4) OVER w AS INT) AS tile4,
      | percent_rank() OVER w AS pct_rank,
      | cume_dist() OVER w AS cume
      |FROM orders WHERE o_orderkey % 7 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT),
      |                      o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // DYNAMIC PARTITION PRUNING: lineitem laid out partitioned by ship
  // month (the canonical 100 TB layout for a date-sliced fact), joined
  // ON THE PARTITION COLUMN to a dim whose qualifying months are known
  // only at runtime — an aggregate-plus-threshold over orders, where
  // the threshold is itself a computed scalar (months busier than the
  // monthly average), so no static pushdown can resolve it. Catalyst's
  // PartitionPruning rule inserts a DynamicPruningExpression into the
  // fact scan's partition filters (reusing the dim's broadcast): only
  // the qualifying months' directories are listed and read. At 100 TB
  // this is the difference between scanning every month of a fact and
  // the handful that qualify — without it, the filter applies only
  // AFTER a full scan. Plan shape (the dynamicpruning partition
  // filter) is pinned in PlanShapeSpec; this row pins the answer. The
  // above-average threshold keeps the predicate scale-free: it selects
  // a proper subset of months at every SF.
  // -------------------------------------------------------------------
  def dppPartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    factByShipMonth(spark, dir).join(broadcast(busyMonths(spark, dir)),
        col("l_sm") === col("om"))
      .groupBy(col("l_sm"))
      .agg(
        Queries.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"),
        max(col("n_orders")).as("n_orders"))
      .orderBy(col("l_sm"))
  }

  /** The lineitem fact re-laid-out hive-partitioned by ship month into
    * a scratch dir — the layout under which runtime pruning can skip
    * whole directories. Shared by the oracle row and the plan pin.
    */
  def factByShipMonth(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dpp").toString
    Tables.load(spark, dir, "lineitem")
      .select(col("l_extendedprice"), col("l_discount"),
        date_format(col("l_shipdate"), "yyyy-MM").as("l_sm"))
      .write.mode("overwrite").partitionBy("l_sm").parquet(s"$root/fact")
    spark.read.parquet(s"$root/fact")
  }

  /** Months with above-average order volume — the runtime-only dim.
    * The threshold rides as a SCALAR SUBQUERY (not the crossJoin
    * idiom): the comparison then survives as a genuine Filter node on
    * the dim subtree, which is what the PartitionPruning rule requires
    * to classify this side as selective — a cross-join threshold fuses
    * into a join condition and the rule sees no filter at all.
    */
  def busyMonths(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .createOrReplaceTempView("graft_dpp_orders")
    spark.sql(
      """WITH m AS (
        |  SELECT date_format(o_orderdate, 'yyyy-MM') AS om,
        |         count(*) AS n_orders
        |  FROM graft_dpp_orders GROUP BY 1
        |)
        |SELECT om, n_orders FROM m
        |WHERE n_orders > (SELECT avg(n_orders) FROM m)""".stripMargin)
  }

  val dppPartitionPruneSql: String =
    """WITH m AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS om,
      |         count(*) AS n_orders
      |  FROM orders GROUP BY 1
      |), dim AS (
      |  SELECT * FROM m
      |  WHERE n_orders > (SELECT avg(n_orders) FROM m)
      |)
      |SELECT strftime(l_shipdate, '%Y-%m') AS l_sm,
      | CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |               AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      | count(*) AS n_items,
      | max(n_orders) AS n_orders
      |FROM lineitem
      |JOIN dim ON strftime(l_shipdate, '%Y-%m') = dim.om
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dpp_partition_prune" -> (dppPartitionPrune _),
    "tpch_q1" -> (tpchQ1 _),
    "tpch_q2" -> (tpchQ2 _),
    "tpch_q3" -> (tpchQ3 _),
    "tpch_q9" -> (tpchQ9 _),
    "tpch_q11" -> (tpchQ11 _),
    "tpch_q16" -> (tpchQ16 _),
    "tpch_q20" -> (tpchQ20 _),
    "tpch_q4" -> (tpchQ4 _),
    "tpch_q5" -> (tpchQ5 _),
    "tpch_q21" -> (tpchQ21 _),
    "tpch_q22" -> (tpchQ22 _),
    "tpch_q6" -> (tpchQ6 _),
    "tpch_q7" -> (tpchQ7 _),
    "tpch_q8" -> (tpchQ8 _),
    "tpch_q10" -> (tpchQ10 _),
    "tpch_q12" -> (tpchQ12 _),
    "tpch_q13" -> (tpchQ13 _),
    "tpch_q14" -> (tpchQ14 _),
    "tpch_q15" -> (tpchQ15 _),
    "tpch_q17" -> (tpchQ17 _),
    "tpch_q18" -> (tpchQ18 _),
    "tpch_q19" -> (tpchQ19 _),
    "window_distribution" -> (windowDistribution _),
    "hist_mv_percentile" -> (histMvPercentile _),
    "assoc_rules" -> (assocRules _),
    "format_roundtrip" -> (formatRoundtrip _),
    "hll_mv_distinct" -> (hllMvDistinct _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "ewma_user" -> (ewmaUser _),
    "corr_exact" -> (corrExact _),
    "mv_rewrite" -> (mvRewrite _),
    "gap_fill" -> (gapFill _),
    "dq_expectations" -> (dqExpectations _),
    "pagerank" -> (pageRank _),
    "graph_triangles" -> (graphTriangles _),
    "robust_outliers" -> (robustOutliers _),
    "unpivot_metrics" -> (unpivotMetrics _),
    "anomaly_zscore" -> (anomalyZscore _),
    "histogram_equidepth" -> (histogramEquidepth _))

  val oracles: Map[String, String] = Map(
    "dpp_partition_prune" -> dppPartitionPruneSql,
    "tpch_q1" -> tpchQ1Sql,
    "tpch_q2" -> tpchQ2Sql,
    "tpch_q3" -> tpchQ3Sql,
    "tpch_q9" -> tpchQ9Sql,
    "tpch_q11" -> tpchQ11Sql,
    "tpch_q16" -> tpchQ16Sql,
    "tpch_q20" -> tpchQ20Sql,
    "tpch_q4" -> tpchQ4Sql,
    "tpch_q5" -> tpchQ5Sql,
    "tpch_q21" -> tpchQ21Sql,
    "tpch_q22" -> tpchQ22Sql,
    "tpch_q6" -> tpchQ6Sql,
    "tpch_q7" -> tpchQ7Sql,
    "tpch_q8" -> tpchQ8Sql,
    "tpch_q10" -> tpchQ10Sql,
    "tpch_q12" -> tpchQ12Sql,
    "tpch_q13" -> tpchQ13Sql,
    "tpch_q14" -> tpchQ14Sql,
    "tpch_q15" -> tpchQ15Sql,
    "tpch_q17" -> tpchQ17Sql,
    "tpch_q18" -> tpchQ18Sql,
    "tpch_q19" -> tpchQ19Sql,
    "window_distribution" -> windowDistributionSql,
    "hist_mv_percentile" -> histMvPercentileSql,
    "assoc_rules" -> assocRulesSql,
    "format_roundtrip" -> formatRoundtripSql,
    "hll_mv_distinct" -> hllMvDistinctSql,
    "agg_grouping_sets" -> aggGroupingSetsSql,
    "ewma_user" -> ewmaUserSql,
    "corr_exact" -> corrExactSql,
    "mv_rewrite" -> mvRewriteSql,
    "gap_fill" -> gapFillSql,
    "dq_expectations" -> dqExpectationsSql,
    "pagerank" -> pageRankSql,
    "graph_triangles" -> graphTrianglesSql,
    "robust_outliers" -> robustOutliersSql,
    "unpivot_metrics" -> unpivotMetricsSql,
    "anomaly_zscore" -> anomalyZscoreSql,
    "histogram_equidepth" -> histogramEquidepthSql)
}
