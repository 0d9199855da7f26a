package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** Oracle coverage for the partition-granular copy-on-write table
  * ([[graft.sinks.CowTable]]) — the Delta-style manifest commit the
  * reference provisions but never wires (commons/install-delta.sh:
  * 10-21). Each query drives the FULL write path (commit → COW merge →
  * manifest read-back) inside a scratch directory and returns the
  * resulting table state, so the DuckDB oracle checks the end-to-end
  * storage round-trip, not just the in-memory merge: a partition
  * carried by reference that dropped rows, a manifest that listed a
  * stale file, or a data-skipping read that pruned a live file would
  * all hash-mismatch.
  *
  * The oracles are the SAME SQL as the non-COW merge/CDC queries
  * ([[QueriesCurated.mergeUpsertSql]], [[QueriesCurated.cdcApplySql]])
  * — deliberate: COW is a storage strategy, and its observable
  * contract is "bit-identical table state to the full rewrite".
  */
object QueriesCow {

  private def scratch(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString

  /** Key-derived bucket partitioning: the stable-partition contract
    * [[CowTable.upsert]] requires, over 8 buckets so a sf0.01 dim
    * exercises many partition dirs with several untouched per batch.
    */
  private val NBuckets = 8

  // -------------------------------------------------------------------
  // COW MERGE: same four-region merge as `merge_upsert` (untouched /
  // v1-updated / v2-newest-wins / inserted) but applied through the
  // bucket-partitioned COW table — only the buckets the delta's keys
  // hash into are rewritten; the rest carry over by manifest reference
  // (rewrite-avoidance itself is pinned in `CowTableSpec`; THIS query
  // pins that the carried + rewritten union is the right table).
  // -------------------------------------------------------------------
  def cowUpsert(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("cow_upsert")
    val bucket = CowTable.keyBucket(Seq("c_custkey"), NBuckets)
    val c = Tables.load(spark, dir, "customer")
    val target = c.where(col("c_custkey") <= 1000)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        bucket.as("pb"))
    CowTable.commitFull(target, root, 1L, Seq("pb"))
    val v1 = c.where(col("c_custkey").between(501, 1500))
      .select(col("c_custkey"), upper(col("c_name")).as("c_name"),
        col("c_mktsegment"), bucket.as("pb"), lit(1L).as("ver"))
    val v2 = c.where(col("c_custkey").between(900, 1200))
      .select(col("c_custkey"), concat(col("c_name"), lit("-v2")).as("c_name"),
        lit("UPDATED").as("c_mktsegment"), bucket.as("pb"), lit(2L).as("ver"))
    CowTable.upsert(spark, root, 2L, v1.unionByName(v2),
      Seq("c_custkey"), Seq("pb"), versionCol = Some("ver"))
    CowTable.read(spark, root).get
      .drop("pb").orderBy("c_custkey")
  }

  val cowUpsertSql: String = QueriesCurated.mergeUpsertSql

  // -------------------------------------------------------------------
  // COW CDC: the full I/U/D + rebirth batch of `cdc_apply` through the
  // COW table. D rows carry only the key — the bucket derives from it,
  // so deletes route to the right partition without knowing the row.
  // -------------------------------------------------------------------
  def cowCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("cow_cdc")
    val bucket = CowTable.keyBucket(Seq("c_custkey"), NBuckets)
    val c = Tables.load(spark, dir, "customer")
    val target = c.where(col("c_custkey") <= 1000)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        bucket.as("pb"))
    CowTable.commitFull(target, root, 1L, Seq("pb"))
    def nullStr = lit(null).cast("string")
    val batch =
      c.where(col("c_custkey").between(101, 200)).select(
        col("c_custkey"), nullStr.as("c_name"), nullStr.as("c_mktsegment"),
        lit("D").as("oper"), lit(1L).as("ver"))
      .unionByName(c.where(col("c_custkey").between(201, 300)).select(
        col("c_custkey"), upper(col("c_name")).as("c_name"),
        col("c_mktsegment"), lit("U").as("oper"), lit(1L).as("ver")))
      .unionByName(c.where(col("c_custkey").between(1001, 1100)).select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        lit("I").as("oper"), lit(1L).as("ver")))
      .unionByName(c.where(col("c_custkey").between(150, 170)).select(
        col("c_custkey"), concat(col("c_name"), lit("-reborn")).as("c_name"),
        lit("REBORN").as("c_mktsegment"), lit("I").as("oper"), lit(2L).as("ver")))
      .unionByName(c.where(col("c_custkey").between(250, 260)).select(
        col("c_custkey"), nullStr.as("c_name"), nullStr.as("c_mktsegment"),
        lit("D").as("oper"), lit(2L).as("ver")))
    CowTable.applyCdc(spark, root, 2L,
      batch.withColumn("pb", bucket),
      Seq("c_custkey"), Seq("pb"), versionCol = Some("ver"))
    CowTable.read(spark, root).get
      .drop("pb").orderBy("c_custkey")
  }

  val cowCdcApplySql: String = QueriesCurated.cdcApplySql

  // -------------------------------------------------------------------
  // DATA SKIPPING under oracle: range-sorted layout (8 files with
  // disjoint o_orderkey envelopes), then a selective range read through
  // the manifest's min/max stats. The oracle is the plain WHERE — the
  // compare fails if skipping ever drops a live file; the bytes-read
  // reduction itself is asserted in `CowTableSpec` via the metrics
  // listener.
  // -------------------------------------------------------------------
  def cowSkipping(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("cow_skip")
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderpriority"))
      .repartitionByRange(8, col("o_orderkey"))
    CowTable.commitFull(o, root, 1L, Nil, sortCols = Seq("o_orderkey"))
    CowTable.readWhereBetween(spark, root, "o_orderkey",
      Some("1500"), Some("6000"))
      .orderBy("o_orderkey")
  }

  val cowSkippingSql: String =
    """SELECT o_orderkey, o_custkey,
      | CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
      | o_orderpriority
      |FROM orders WHERE o_orderkey BETWEEN 1500 AND 6000
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // SCD-2 CDC through COW buckets: the full gapped-dimension batch of
  // scd2_cdc (I/U/D at eff 200, rebirths and second deletes at 300)
  // applied as TWO incremental COW batches — bootstrap then changes —
  // so bucket-granular history rewrites, the cross-batch closed
  // frontier, and the manifest carry-over all sit under the oracle's
  // hash. Oracle = the same chain SQL as scd2_cdc: COW is a storage
  // strategy; the dimension's history must be bit-identical.
  // -------------------------------------------------------------------
  def cowScd2Cdc(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("cow_scd2")
    val bucket = CowTable.keyBucket(Seq("c_custkey"), NBuckets)
    val c = Tables.load(spark, dir, "customer")
    val boot = c.where(col("c_custkey") <= 1000).select(
      col("c_custkey"), col("c_name"), col("c_mktsegment"),
      bucket.as("pb"), lit(100L).as("eff"), lit("I").as("oper"))
    CowTable.applyScd2Cdc(spark, root, 1L, boot,
      Seq("c_custkey"), Seq("pb"), "eff")
    def nullStr = lit(null).cast("string")
    val changes =
      c.where(col("c_custkey").between(101, 200)).select(
        col("c_custkey"), nullStr.as("c_name"), nullStr.as("c_mktsegment"),
        lit(200L).as("eff"), lit("D").as("oper"))
      .unionByName(c.where(col("c_custkey").between(201, 300)).select(
        col("c_custkey"), upper(col("c_name")).as("c_name"),
        col("c_mktsegment"), lit(200L).as("eff"), lit("U").as("oper")))
      .unionByName(c.where(col("c_custkey").between(1001, 1100)).select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        lit(200L).as("eff"), lit("I").as("oper")))
      .unionByName(c.where(col("c_custkey").between(150, 170)).select(
        col("c_custkey"), concat(col("c_name"), lit("-reborn")).as("c_name"),
        lit("REBORN").as("c_mktsegment"), lit(300L).as("eff"),
        lit("I").as("oper")))
      .unionByName(c.where(col("c_custkey").between(250, 260)).select(
        col("c_custkey"), nullStr.as("c_name"), nullStr.as("c_mktsegment"),
        lit(300L).as("eff"), lit("D").as("oper")))
    CowTable.applyScd2Cdc(spark, root, 2L,
      changes.withColumn("pb", bucket),
      Seq("c_custkey"), Seq("pb"), "eff")
    CowTable.read(spark, root).get
      .drop("pb").orderBy("c_custkey", "effective_from")
  }

  val cowScd2CdcSql: String = QueriesCurated.scd2CdcSql

  // -------------------------------------------------------------------
  // Merge-on-read delete under oracle: tombstone a key slice (no data
  // rewrite — pinned in CowTableSpec), then prove the MOR read and the
  // post-fold COW read are the SAME table before hashing it against
  // the plain NOT-BETWEEN filter. Read-path subtraction, fold
  // equivalence, and manifest carry-over all sit under one row.
  // -------------------------------------------------------------------
  def cowMorDelete(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("cow_mor")
    val bucket = CowTable.keyBucket(Seq("c_custkey"), NBuckets)
    val c = Tables.load(spark, dir, "customer")
    CowTable.commitFull(
      c.where(col("c_custkey") <= 1000).select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        bucket.as("pb")),
      root, 1L, Seq("pb"))
    CowTable.deleteKeysMor(spark, root, 2L,
      c.where(col("c_custkey").between(101, 200))
        .select(col("c_custkey"), bucket.as("pb")),
      Seq("c_custkey"), Seq("pb"))
    val mor = CowTable.read(spark, root).get.drop("pb")
    require(CowTable.foldTombstones(spark, root, 3L))
    val folded = CowTable.read(spark, root).get.drop("pb")
    require(mor.exceptAll(folded).isEmpty && folded.exceptAll(mor).isEmpty,
      "merge-on-read state diverged from the folded copy-on-write state")
    folded.orderBy("c_custkey")
  }

  val cowMorDeleteSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE c_custkey <= 1000 AND c_custkey NOT BETWEEN 101 AND 200
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------
  // Keyed point lookup through bucket pruning: fetch a scattered key
  // set from the bucket-partitioned table, reading only the keys'
  // buckets (byte-wise proof in CowTableSpec; THIS row proves the
  // pruned semi-join returns exactly the plain IN-filter's rows).
  // -------------------------------------------------------------------
  def cowLookup(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("cow_lookup")
    val bucket = CowTable.keyBucket(Seq("c_custkey"), NBuckets)
    val c = Tables.load(spark, dir, "customer")
    CowTable.commitFull(
      c.select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        bucket.as("pb")),
      root, 1L, Seq("pb"))
    val keys = c.where(col("c_custkey") % 97 === 0)
      .select(col("c_custkey"), bucket.as("pb"))
    CowTable.lookupKeys(spark, root, keys, Seq("c_custkey"), Seq("pb"))
      .drop("pb").orderBy("c_custkey")
  }

  val cowLookupSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer WHERE c_custkey % 97 = 0
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------
  // Bloom-filtered point lookup: hash-scattered layout (every file's
  // min/max envelope spans ~the whole key space, so envelope skipping
  // is useless by construction) + per-file Bloom filters on the lookup
  // column. CowTableSpec proves the file-count reduction; this row
  // proves the bloom never drops the file actually holding the value —
  // a false NEGATIVE (the only correctness hazard a bloom can have)
  // would lose the row and break the hash.
  // -------------------------------------------------------------------
  def cowBloomLookup(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("cow_bloom")
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .repartition(8, xxhash64(col("c_custkey")))
    CowTable.commitFull(c, root, 1L, Nil, bloomCols = Seq("c_name"))
    CowTable.readWhereBetween(spark, root, "c_name",
      Some("Customer#000000042"), Some("Customer#000000042"))
      .orderBy("c_custkey")
  }

  val cowBloomLookupSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer WHERE c_name = 'Customer#000000042'
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------
  // Z-ORDER clustering under oracle: orders clustered on the Morton
  // interleave of (o_custkey, o_orderkey) — two decorrelated dimensions
  // — then a skipping range read on o_custkey, the SECOND dimension a
  // linear sort could not prune (CowTableSpec pins the both-columns-
  // prune property; this row pins that the pruned read still returns
  // exactly the plain WHERE's rows through the full write→manifest→
  // skip→scan cycle).
  // -------------------------------------------------------------------
  def cowZorder(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch("cow_zorder")
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    CowTable.commitFull(
      graft.sinks.ZOrder.cluster(o, Seq("o_custkey", "o_orderkey"),
        nFiles = 16),
      root, 1L, Nil)
    CowTable.readWhereBetween(spark, root, "o_custkey",
      Some("100"), Some("400"))
      .orderBy("o_orderkey")
  }

  val cowZorderSql: String =
    """SELECT o_orderkey, o_custkey,
      | CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |FROM orders WHERE o_custkey BETWEEN 100 AND 400
      |ORDER BY o_orderkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cow_upsert" -> (cowUpsert _),
    "cow_cdc_apply" -> (cowCdcApply _),
    "cow_skipping" -> (cowSkipping _),
    "cow_scd2_cdc" -> (cowScd2Cdc _),
    "cow_lookup" -> (cowLookup _),
    "cow_mor_delete" -> (cowMorDelete _),
    "cow_bloom_lookup" -> (cowBloomLookup _),
    "cow_zorder" -> (cowZorder _))

  val oracles: Map[String, String] = Map(
    "cow_upsert" -> cowUpsertSql,
    "cow_cdc_apply" -> cowCdcApplySql,
    "cow_skipping" -> cowSkippingSql,
    "cow_scd2_cdc" -> cowScd2CdcSql,
    "cow_lookup" -> cowLookupSql,
    "cow_mor_delete" -> cowMorDeleteSql,
    "cow_bloom_lookup" -> cowBloomLookupSql,
    "cow_zorder" -> cowZorderSql)
}
