package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sinks.CowTable

/** Partition-pruned manifest loading (round-16 verdict #1): catalog
  * resolution is head-only ([[graft.sinks.CowManifestMeta]]) and a
  * FILTERED scan of a COLD table pushes its partition predicate into
  * the manifest/checkpoint parquet read itself
  * (`CowTable.prunedManifest` via `CowLazyFileIndex`), materializing
  * O(kept) entries driver-side instead of O(table files). A WARM
  * table (memo-resident manifest) never takes the pruned path — same
  * cost as the eager index. Also pins round-16 verdict #7: a crashed
  * checkpoint collapse (`_ckpt-<id>` without `_SUCCESS`) is invisible
  * — both the eager parse and the pruned loader fall back to the
  * delta chain, under concurrency too.
  */
class PrunedManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshNs(tag: String): String = {
    val ns = s"$tag${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE NAMESPACE cow.$ns")
    ns
  }

  private def qroot(root: String): String =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(new Path(root)).toString

  private def counters(root: String): (Long, Long) = (
    Option(CowTable.prunedLoads.get(qroot(root))).getOrElse(0L),
    Option(CowTable.entriesMaterialized.get(qroot(root))).getOrElse(0L))

  private def goCold(): Unit = {
    CowTable.clearManifestMemoForTest()
    CowTable.clearMetaMemoForTest()
  }

  test("a 1-partition read of a cold N-partition table materializes " +
      "O(1/N) entries driver-side, through the delta chain, and " +
      "matches the full read") {
    val ns = freshNs("pml")
    val root = s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/t"
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    // two appends → delta-manifest chain (adds carried per link)
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 20 FROM range(2000)")
    spark.sql(s"INSERT INTO cow.$ns.t " +
      "SELECT id, id % 20 FROM range(2000, 4000)")
    val totalEntries = CowTable.currentManifest(spark, root).get
      .allFiles.length
    assert(totalEntries >= 20, s"need a multi-file table, got $totalEntries")

    goCold()
    val (loads0, mat0) = counters(root)
    val got = spark.table(s"cow.$ns.t").where($"p" === 3L)
      .agg(count(lit(1)).as("n"), sum("id").as("s"))
      .as[(Long, Long)].head()
    val (loads1, mat1) = counters(root)
    assert(loads1 > loads0, "a cold filtered read must take the " +
      "pruned-manifest path, not a full parse")
    val materialized = mat1 - mat0
    assert(materialized > 0 && materialized <= totalEntries / 5,
      s"pruned load must land O(1/N) entries driver-side: " +
        s"materialized $materialized of $totalEntries")
    // correctness against the in-memory full read
    val want = (0L until 4000L).filter(_ % 20 == 3)
    assert(got == ((want.size.toLong, want.sum)), s"got $got")

    // the PATH-form data source takes the same lazy route
    goCold()
    val (loadsP0, matP0) = counters(root)
    assert(spark.read.format("cow").load(root).where($"p" === 3L)
      .count() == want.size.toLong)
    val (loadsP1, matP1) = counters(root)
    assert(loadsP1 > loadsP0 && matP1 - matP0 <= totalEntries / 5,
      s"format(cow) cold filtered read must prune-load: " +
        s"${matP1 - matP0} of $totalEntries")

    // WARM table: with the manifest memo populated, the same filtered
    // read serves in memory — zero additional pruned loads
    CowTable.manifest(spark, root,
      CowTable.committedIds(spark, root).last)
    val (loads2, _) = counters(root)
    assert(spark.table(s"cow.$ns.t").where($"p" === 3L).count() ==
      want.size.toLong)
    val (loads3, _) = counters(root)
    assert(loads3 == loads2,
      "a memo-warm read must not re-load the manifest")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("a cold pruned read works across a PARTITION-COLUMN rename: " +
      "the snapshot's manifest carries re-keyed partition values " +
      "under the new logical name") {
    val ns = freshNs("pmr")
    val root = s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/t"
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 8 FROM range(800)")
    spark.sql(s"ALTER TABLE cow.$ns.t RENAME COLUMN p TO q")
    goCold()
    val (loads0, _) = counters(root)
    assert(spark.table(s"cow.$ns.t").where($"q" === 5L).count() == 100L)
    val (loads1, _) = counters(root)
    assert(loads1 > loads0, "cold filtered read after a partition-" +
      "column rename must still take the pruned path")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("cold unfiltered reads take the full (memoizing) parse; " +
      "data-column RANGE filters push their min/max envelope into " +
      "the manifest read — pruning never drops rows") {
    val ns = freshNs("pmf")
    val root = s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/t"
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    // two id-range batches → per-file id envelopes are disjoint
    // across batches (the layout envelope skipping needs)
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 5 FROM range(250)")
    spark.sql(s"INSERT INTO cow.$ns.t " +
      "SELECT id, id % 5 FROM range(250, 500)")
    val totalEntries = CowTable.currentManifest(spark, root).get
      .allFiles.length
    goCold()
    val (loadsU0, _) = counters(root)
    assert(spark.table(s"cow.$ns.t").count() == 500L)
    val (loadsU1, _) = counters(root)
    assert(loadsU1 == loadsU0,
      "an unfiltered cold read must take the full parse, not a " +
        "pruned load (the scan opens every file anyway)")
    goCold()
    // data-column RANGE predicate: the envelope half of skipping
    // pushes into the manifest read (round-16) — cold driver
    // materializes only the entries whose [min,max] may intersect
    val (loadsD0, matD0) = counters(root)
    assert(spark.table(s"cow.$ns.t").where($"id" < 100L).count() == 100L)
    val (loadsD1, matD1) = counters(root)
    assert(loadsD1 > loadsD0,
      "a cold range-filtered read must take the pruned path")
    assert(matD1 - matD0 > 0 && matD1 - matD0 < totalEntries,
      s"envelope pushdown must narrow the materialized entries: got " +
        s"${matD1 - matD0} of $totalEntries")
    // NULL partition value: pruned path must keep NULL-part files out
    // for an equality (NULL never equals) and correctness holds
    spark.sql(s"INSERT INTO cow.$ns.t VALUES (9999L, NULL)")
    goCold()
    assert(spark.table(s"cow.$ns.t").where($"p" === 2L).count() == 100L)
    goCold()
    assert(spark.table(s"cow.$ns.t").where($"p".isNull)
      .select("id").as[Long].collect().toSeq == Seq(9999L))
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("a deleted-and-recreated root does not serve a stale debt-free " +
      "verdict: the lazy-read gate re-answers under the fingerprint " +
      "guard and MOR debt is applied") {
    val root = s"/tmp/graft_pmn_${System.nanoTime()}"
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    def mk(): Unit = CowTable.commitFull(
      spark.range(10).select($"id", ($"id" % 2).as("p")),
      root, 1L, Seq("p"), keep = 10)
    mk()
    CowTable.commitAppend(
      spark.range(10, 12).select($"id", ($"id" % 2).as("p")),
      root, 2L, Seq("p"), keep = 10)
    goCold()
    // cold filtered read caches the debt-free verdict for (root, 2)
    assert(spark.read.format("cow").load(root).where($"p" === 0L)
      .count() == 6L)
    // recreate the root from scratch: same ids, DIFFERENT content —
    // the new snapshot 2 carries positional-DV debt
    fs.delete(new Path(root), true)
    mk()
    CowTable.deleteWhereDvBy(spark, root, 2L,
      df => df("id") < 5, keep = 10)
    goCold()
    // the re-answered gate routes to the EAGER relation, whose
    // documented contract for unfolded MOR debt is the LOUD refusal —
    // a stale TRUE would instead have silently served the deleted rows
    val e = intercept[Exception](
      spark.read.format("cow").load(root).collect())
    assert(e.getMessage.contains("merge-on-read"),
      s"recreated debt-carrying root must refuse loudly, got: $e")
    // the programmatic reader applies the subtraction — correct rows
    assert(CowTable.read(spark, root).get
      .select("id").as[Long].collect().toSet == (5L until 10L).toSet)
  }

  test("a crashed checkpoint collapse (_ckpt without _SUCCESS) is " +
      "invisible: eager parse AND cold pruned reads fall back to the " +
      "chain, under concurrent checkpointing too") {
    val ns = freshNs("ckr")
    val root = s"${spark.conf.get("spark.sql.catalog.cow.warehouse")}/$ns/t"
    spark.sql(s"CREATE TABLE cow.$ns.t (id BIGINT, p BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 4 FROM range(400)")
    spark.sql(s"INSERT INTO cow.$ns.t SELECT id, id % 4 " +
      "FROM range(400, 800)")
    val head = CowTable.committedIds(spark, root).last
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    // fake a crashed collapse: a _ckpt dir holding a WRONG entry list
    // (a stale copy of snapshot 1's manifest) and no _SUCCESS marker
    val ckpt = new Path(s"$root/_ckpt-$head")
    fs.mkdirs(ckpt)
    val m1 = fs.listStatus(new Path(s"$root/manifest-1")).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, m1, fs,
      new Path(ckpt, "part-stale.parquet"), false,
      spark.sparkContext.hadoopConfiguration)
    goCold()
    assert(spark.table(s"cow.$ns.t").where($"p" === 1L).count() == 200L,
      "cold pruned read must ignore the uncommitted checkpoint")
    goCold()
    assert(CowTable.manifest(spark, root, head).files
      .map(_.rows).sum == 800L,
      "eager parse must ignore the uncommitted checkpoint")
    // concurrent explicit collapses + readers: rename loser is benign,
    // every reader sees the full 800 rows throughout
    goCold()
    val threads = (0 until 6).map { i =>
      new Thread(() => {
        if (i % 2 == 0) CowTable.checkpoint(spark, root, head)
        else assert(CowTable.manifest(spark, root, head).files
          .map(_.rows).sum == 800L)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(fs.exists(new Path(ckpt, "_SUCCESS")),
      "an explicit checkpoint must have collapsed the chain")
    goCold()
    assert(spark.table(s"cow.$ns.t").where($"p" === 1L).count() == 200L,
      "post-collapse cold pruned read serves from the checkpoint")

    // STRANDED-TWIN adoption: a crashed sweep renamed the COMMITTED
    // checkpoint aside and died before restoring, and the chain's
    // base was pruned meanwhile — the snapshot's only copy lives
    // under the .stale- name, and readers must adopt it
    val stale = new Path(s"$root/_ckpt-$head.stale-testcrash")
    require(fs.rename(ckpt, stale), "test setup: rename aside")
    fs.delete(new Path(s"$root/manifest-2"), true) // prune the base
    goCold()
    assert(CowTable.manifest(spark, root, head).files
      .map(_.rows).sum == 800L,
      "a committed .stale- twin must be adopted when the chain is gone")
    goCold()
    assert(spark.table(s"cow.$ns.t").where($"p" === 1L).count() == 200L,
      "cold pruned reads recover through the same adoption")
    spark.sql(s"DROP NAMESPACE cow.$ns CASCADE")
  }

  test("publishCheckpoint reclaims a tmp copy NESTED by rename-onto-" +
      "existing-dir (ADVICE r16): the committed winner survives, the " +
      "losing copy leaves no hidden junk") {
    val root = s"/tmp/graft_pcn_${System.nanoTime()}"
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val ckpt = new Path(s"$root/_ckpt-7")
    fs.mkdirs(ckpt)
    fs.create(new Path(ckpt, "part-winner.parquet"), true).close()
    fs.create(new Path(ckpt, "_SUCCESS"), true).close()
    val tmp = new Path(s"$root/_ckpt-7.tmp-loser")
    fs.mkdirs(tmp)
    fs.create(new Path(tmp, "part-loser.parquet"), true).close()
    fs.create(new Path(tmp, "_SUCCESS"), true).close()
    // local-fs rename onto an existing dir MOVES the source inside it
    // and reports success — exactly the hazard the publisher handles
    CowTable.publishCheckpoint(fs, tmp, ckpt)
    assert(fs.exists(new Path(ckpt, "_SUCCESS")))
    assert(fs.exists(new Path(ckpt, "part-winner.parquet")),
      "the committed winner's content must survive a losing publish")
    assert(!fs.exists(new Path(ckpt, "_ckpt-7.tmp-loser")),
      "the nested losing tmp copy must be reclaimed")
    assert(!fs.exists(tmp), "no top-level tmp leftovers either")
  }
}
