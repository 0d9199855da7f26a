package graft

import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** rowCount in planner statistics (round-16 verdict #5): a NAMED cow
  * read attaches the manifest's exact live-row count (and byte sum)
  * as `CatalogStatistics` on its `LogicalRelation`
  * (`CowCatalogRule.statsTableFor`), the seam `computeStats` consults
  * before the byte-size fallback. With
  * `spark.sql.cbo.planStats.enabled` on, size estimates derive from
  * ROW COUNT × row width instead of on-disk bytes — the case the pin
  * below makes decisive: a small-rowcount table whose incompressible
  * strings make it byte-heavy broadcasts only when the planner can
  * see its row count. Default confs keep the byte-size behavior
  * bit-identically.
  */
class RowCountStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshNs(tag: String): String = {
    val ns = s"$tag${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    ns
  }

  test("a byte-heavy, small-rowcount named table flips to broadcast " +
      "exactly when planStats exposes the manifest's rowCount") {
    val ns = freshNs("rcs")
    val root = s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/d"
    spark.sql(s"CREATE TABLE cow.$ns.d (k BIGINT, pad STRING)")
    // ~1 KB of sha-chained (incompressible) text per row: 300 rows ≈
    // hundreds of KB on disk, but a ~30 B/row planner width
    spark.sql(s"""INSERT INTO cow.$ns.d SELECT id AS k,
      concat(sha2(cast(id AS STRING), 512),
             sha2(cast(id + 1 AS STRING), 512),
             sha2(cast(id * 7 AS STRING), 512),
             sha2(cast(id * 13 AS STRING), 512),
             sha2(cast(id * 29 AS STRING), 512),
             sha2(cast(id * 31 AS STRING), 512),
             sha2(cast(id * 37 AS STRING), 512),
             sha2(cast(id * 41 AS STRING), 512)) AS pad
      FROM range(300)""")
    val head = CowTable.committedIds(spark, root).last
    // stats serve only from a WARM manifest (they must never force a
    // cold materialization) — warm it, as any prior read would
    val m = CowTable.manifest(spark, root, head)
    val diskBytes = m.files.map(_.bytes).sum
    assert(m.files.map(_.rows).sum == 300L)
    val threshold = 64L * 1024
    assert(diskBytes > threshold,
      s"test needs a byte-heavy table, got $diskBytes")
    spark.range(100000).select(($"id" % 300).as("k"), $"id".as("amt"))
      .createOrReplaceTempView("rcs_fact")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      threshold.toString)
    try {
      def planOf(): String = spark.sql(
        s"SELECT sum(f.amt) AS s FROM rcs_fact f " +
          s"JOIN cow.$ns.d d ON f.k = d.k")
        .queryExecution.sparkPlan.toString
      // default confs: the estimate is the on-disk byte sum — above
      // the threshold, no broadcast (the exact pre-round behavior)
      assert(!planOf().contains("BroadcastHashJoin"),
        s"byte-size estimate ($diskBytes > $threshold) must not " +
          s"broadcast:\n${planOf()}")
      spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
      try assert(planOf().contains("BroadcastHashJoin"),
        s"rowCount-based estimate (300 rows) must broadcast:\n${planOf()}")
      finally spark.conf.unset("spark.sql.cbo.planStats.enabled")
      // correctness unaffected by the estimate source
      val s = spark.sql(s"SELECT sum(f.amt) AS s FROM rcs_fact f " +
        s"JOIN cow.$ns.d d ON f.k = d.k").as[Long].head()
      assert(s == (0L until 100000L).map(_.toLong).sum)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("narrowed scans re-narrow the attached statistics: a filtered " +
      "slice's rowCount reflects the surviving files, not the table") {
    val ns = freshNs("rcn")
    val root = s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/t"
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 10 FROM range(1000)")
    val head = CowTable.committedIds(spark, root).last
    CowTable.manifest(spark, root, head) // warm → stats attach
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try {
      val slice = spark.table(s"cow.$ns.t").where($"p" === 3L)
      // the RELATION leaf carries the narrowed stats (Filter-level
      // propagation of rowCount is full-CBO's job, not this rule's)
      val stats = slice.queryExecution.optimizedPlan.collectLeaves()
        .head.stats
      assert(stats.rowCount.exists(rc => rc >= 100 && rc < 1000),
        s"narrowed stats must carry the slice's rowCount, got $stats")
    } finally spark.conf.unset("spark.sql.cbo.planStats.enabled")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }
}
