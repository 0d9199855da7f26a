package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sinks.{CowTable, CowV2}

/** Round-17 NESTED skipping stats: struct leaves one level deep carry
  * min/max envelopes and null counts under dotted keys (`s.a`), so
  * range/point/IS-NULL filters on nested fields skip files — eagerly
  * at scan planning AND pushed into the cold pruned manifest load.
  * Missing keys (pre-r17 files, deeper nesting) just never prune.
  */
class NestedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def qroot(root: String): String =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(new Path(root)).toString

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.headOption.getOrElse(fail("no file scan in the executed plan"))
    scan.selectedPartitions.totalNumberOfFiles
  }

  private def goCold(): Unit = {
    CowTable.clearManifestMemoForTest()
    CowTable.clearMetaMemoForTest()
  }

  private def mkTable(root: String): Long = {
    // p = id/100: each partition's single file holds a CONTIGUOUS
    // s.a = id range, so envelopes are disjoint across files
    val df = spark.range(1000).select(
      ($"id" / 100).cast("long").as("p"),
      struct($"id".as("a"), concat(lit("v"), $"id").as("b")).as("s"))
    CowTable.commitFull(df, root, 1L, Seq("p"), keep = 10)
    CowTable.currentManifest(spark, root).get.files.length.toLong
  }

  test("struct leaves collect dotted stats and a nested range filter " +
      "skips files at scan planning — result identical to the full " +
      "scan") {
    val root = Files.createTempDirectory("nst").toString
    val total = mkTable(root)
    assert(total >= 10, s"need a multi-file layout, got $total")
    val m = CowTable.currentManifest(spark, root).get
    assert(m.files.forall(f => f.mins.contains("s.a") &&
        f.maxs.contains("s.a") && f.nulls.contains("s.a")),
      "dotted stats must collect for struct leaves")
    assert(m.files.forall(_.mins.contains("s.b")),
      "string struct leaves carry stats too")

    val hit = CowV2.read(spark, root).get.where($"s.a" === 250L)
    assert(filesRead(hit) == 1L,
      s"a nested point filter must skip to the one file")
    assert(hit.select($"s.b").as[String].collect().toSeq == Seq("v250"))

    // strict inequalities prune with the INCLUSIVE envelope (sound
    // superset — pruningOf's documented rule), so `< 100` keeps the
    // boundary file whose min is exactly 100; `<= 99` drops it
    val range = CowV2.read(spark, root).get.where($"s.a" < 100L)
    assert(filesRead(range) == 2L,
      "a nested range filter must skip non-intersecting envelopes")
    assert(range.count() == 100L)
    val tight = CowV2.read(spark, root).get.where($"s.a" <= 99L)
    assert(filesRead(tight) == 1L,
      "an inclusive nested bound must skip every non-intersecting file")
    assert(tight.count() == 100L)
  }

  test("nested envelopes push into the COLD pruned manifest load, " +
      "and IS NOT NULL prunes an all-NULL-leaf file by null counts") {
    val root = Files.createTempDirectory("nsc").toString
    val total = mkTable(root)
    goCold()
    val p0 = Option(CowTable.prunedLoads.get(qroot(root))).getOrElse(0L)
    val e0 = Option(CowTable.entriesMaterialized.get(qroot(root)))
      .getOrElse(0L)
    assert(CowV2.read(spark, root).get.where($"s.a" < 100L).count()
      == 100L)
    val p1 = Option(CowTable.prunedLoads.get(qroot(root))).getOrElse(0L)
    val e1 = Option(CowTable.entriesMaterialized.get(qroot(root)))
      .getOrElse(0L)
    assert(p1 > p0, "a cold nested-range read must take the pruned path")
    assert(e1 - e0 > 0 && e1 - e0 < total,
      s"nested envelope pushdown must narrow the cold load: " +
        s"${e1 - e0} of $total")

    // a partition whose s is entirely NULL: IS NOT NULL skips it via
    // the dotted null counts (a NULL struct counts its leaves NULL)
    CowTable.commitAppend(
      spark.range(10).select(lit(99L).as("p"),
        lit(null).cast("struct<a:bigint,b:string>").as("s")),
      root, 2L, Seq("p"), keep = 10)
    val m = CowTable.currentManifest(spark, root).get
    val all = m.files.length.toLong
    val nn = CowV2.read(spark, root).get.where($"s.a".isNotNull)
    assert(filesRead(nn) == all - 1,
      "IS NOT NULL must skip the all-NULL-leaf file")
    assert(nn.count() == 1000L)
    val isn = CowV2.read(spark, root).get.where($"s.a".isNull)
    assert(filesRead(isn) == 1L,
      "IS NULL must keep only files with a positive null count")
    assert(isn.count() == 10L)
  }

  test("depth-2 nested stats are property-gated (round-18): the " +
      "default collects one level (stat-map weight unchanged); " +
      "setNestedStatsDepth(2) collects s.t.c and a depth-2 range " +
      "filter skips files") {
    val root = Files.createTempDirectory("nsd").toString
    val df = spark.range(1000).select(
      ($"id" / 100).cast("long").as("p"),
      struct($"id".as("a"),
        struct($"id".as("c")).as("t")).as("s"))
    CowTable.commitFull(df, root, 1L, Seq("p"), keep = 10)
    val m1 = CowTable.currentManifest(spark, root).get
    assert(m1.files.forall(f => f.mins.contains("s.a")))
    assert(m1.files.forall(f => !f.mins.contains("s.t.c") &&
        !f.maxs.contains("s.t.c") && !f.nulls.contains("s.t.c")),
      "default depth must stop at one level — stat-map weight unchanged")
    CowTable.setNestedStatsDepth(spark, root, 2)
    CowTable.commitFull(df, root, 2L, Seq("p"), keep = 10)
    val m2 = CowTable.currentManifest(spark, root).get
    assert(m2.files.forall(f => f.mins.contains("s.t.c") &&
        f.maxs.contains("s.t.c") && f.nulls.contains("s.t.c")),
      "depth 2 must collect second-level struct leaves")
    val hit = CowV2.read(spark, root).get.where($"s.t.c" === 250L)
    assert(filesRead(hit) == 1L,
      "a depth-2 point filter must skip to the one file")
    assert(hit.count() == 1L)
    val range = CowV2.read(spark, root).get.where($"s.t.c" <= 99L)
    assert(filesRead(range) == 1L,
      "a depth-2 inclusive bound must skip non-intersecting envelopes")
    assert(range.count() == 100L)
  }

  test("a struct leaf named with a literal dot commits fine and " +
      "simply collects no dotted stat (ADVICE r17: col()/leafType " +
      "would misparse the path)") {
    val root = Files.createTempDirectory("nsl").toString
    val df = spark.range(100).select(
      ($"id" % 4).as("p"),
      struct($"id".as("a.b"), $"id".as("ok")).as("s"))
    CowTable.commitFull(df, root, 1L, Seq("p"), keep = 10)
    val m = CowTable.currentManifest(spark, root).get
    assert(m.files.forall(f => f.mins.contains("s.ok")),
      "clean sibling leaves still collect")
    assert(m.files.forall(f => !f.mins.keys.exists(_.contains("a.b")) &&
        !f.nulls.keys.exists(_.contains("a.b"))),
      "a literal-dot leaf must be skipped, not misparsed into parts")
    assert(CowV2.read(spark, root).get.count() == 100L)
  }

  test("soundness floors: missing dotted stats never prune (pre-r17 " +
      "shape), and an unsafe struct widening strips its nested stats") {
    val root = Files.createTempDirectory("nsf").toString
    mkTable(root)
    // simulate a pre-r17 manifest: strip the dotted keys from the
    // in-memory manifest and check mayMatch keeps everything
    val m = CowTable.currentManifest(spark, root).get
    val bare = m.files.head.copy(
      mins = m.files.head.mins.filterNot(_._1.contains(".")),
      maxs = m.files.head.maxs.filterNot(_._1.contains(".")),
      nulls = m.files.head.nulls.filterNot(_._1.contains(".")))
    assert(CowTable.mayMatch(m.schema, bare, "s.a",
        Some("999999"), None),
      "a file without dotted stats must always be kept")
    // unresolvable path (map/array step): type lookup fails → kept
    assert(CowTable.mayMatch(m.schema, m.files.head, "s.zzz",
      Some("0"), Some("0")))
  }
}
