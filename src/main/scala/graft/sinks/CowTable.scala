package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Cdc, Merge}

/** One data file of a [[CowTable]] snapshot. `path` is table-root-
  * relative (`batch-<id>/…/part-….parquet`); `part` maps each
  * partition column to its Spark string form (null value = the NULL
  * partition); `mins`/`maxs` hold per-column min/max for orderable
  * atomic columns (absent = unknown — readers must keep the file).
  */
final case class CowFile(
    path: String,
    part: Map[String, String],
    rows: Long,
    bytes: Long,
    mins: Map[String, String],
    maxs: Map[String, String],
    kind: String = CowTable.KindData,
    blooms: Map[String, Seq[Long]] = Map.empty)

/** A committed [[CowTable]] snapshot: the authoritative file list (a
  * file NOT listed here does not exist, whatever the directory says),
  * the partitioning, and the table schema at commit time.
  */
final case class CowManifest(
    id: Long,
    partCols: Seq[String],
    schemaDdl: String,
    allFiles: Seq[CowFile]) {
  def schema: StructType = StructType.fromDDL(schemaDdl)
  def partKeyOf(f: CowFile): String = CowTable.partKey(partCols, f.part)
  /** Live DATA files (what a scan reads). */
  def files: Seq[CowFile] = allFiles.filter(_.kind == CowTable.KindData)
  /** Outstanding merge-on-read TOMBSTONE files (what a scan subtracts). */
  def tombstones: Seq[CowFile] =
    allFiles.filter(_.kind == CowTable.KindTombstone)
}

/** Internal persisted shape of one manifest row (one per data file,
  * plus a path-NULL sentinel for an empty table so schema/partitioning
  * survive a fully-deleted state).
  */
private[sinks] final case class CowManifestRow(
    path: String,
    part: Map[String, String],
    rows: Long,
    bytes: Long,
    mins: Map[String, String],
    maxs: Map[String, String],
    part_cols: Seq[String],
    schema_ddl: String,
    kind: String,
    blooms: Map[String, Seq[Long]])

/** Partition-granular COPY-ON-WRITE snapshot table — the incremental
  * completion of [[SnapshotTarget]], whose one honest scale ceiling is
  * the full-table rewrite per merge batch (SnapshotTarget.scala
  * documents it). This is the table-format core trick (Delta/Iceberg —
  * the reference provisions Delta for exactly this,
  * commons/install-delta.sh:10-21, but its jars are absent here) built
  * from two primitives this repo already trusts: immutable parquet
  * writes committed by `_SUCCESS`, and monotonic single-writer batch
  * ids.
  *
  * Layout under `root/`:
  *  - `batch-<id>/[__gp_c=v/…]part-*.parquet` — data files written by
  *    batch `id`, IMMUTABLE once `id` commits. Partition directories
  *    use duplicated `__gp_<c>` columns so the REAL partition columns
  *    stay inside the files — every file is self-contained and reads
  *    need no directory-string parsing (the NULL/escaping trap
  *    [[Compaction]] documents) and no basePath gymnastics.
  *  - `manifest-<id>/` — a tiny parquet dataset, one row per live data
  *    file with its partition values and per-column min/max stats.
  *    A snapshot is COMMITTED iff the manifest's `_SUCCESS` exists —
  *    the same atomic marker protocol as [[SnapshotTarget]], so the
  *    crash matrix carries over verbatim (no marker ⇒ replay
  *    overwrites; marker ⇒ replay skips).
  *
  * A COMMIT of batch `id` touching partitions T:
  *  1. writes ONLY T's new content into `batch-<id>/`;
  *  2. writes `manifest-<id>` = new entries for T (files just written)
  *     ∪ the previous manifest's entries for every partition ∉ T —
  *     untouched partitions are carried BY REFERENCE; their bytes are
  *     never read, never rewritten, and stay byte-identical on disk
  *     (spec-pinned via path+mtime in `CowTableSpec`).
  *
  * So a delta that touches k of N partitions costs O(read k + write k)
  * instead of O(N) — at 100 TB with date- or bucket-partitioned
  * tables, that is the difference between a merge batch costing
  * delta-sized I/O and costing a full-table rewrite per batch.
  *
  * Data skipping: every commit records per-file min/max for orderable
  * atomic columns (collected from the files just written via the
  * `_metadata` column — one delta-sized pass, the same moment Delta
  * stamps its AddFile stats). [[readWhereBetween]] prunes files whose
  * [min,max] cannot intersect the predicate BEFORE Spark ever lists or
  * opens them — manifest-driven skipping on top of partition pruning,
  * the part plain parquet cannot do (its footer stats still require
  * listing + opening every file).
  *
  * Replay safety: [[commit]] refuses ids ≤ the newest committed id.
  * This is load-bearing, not convenience — batch-`id` files may be
  * referenced by LATER manifests, and a replayed overwrite would give
  * the rewritten files fresh task-UUID names, breaking those
  * references. Monotonic ids + in-commit guard make replays no-ops.
  *
  * Single-writer per table root, like [[SnapshotTarget]] and every
  * file-layout format without a lock service. `keep >= 2` retains the
  * previous manifest (and, transitively, every file it references)
  * for in-flight readers.
  */
object CowTable {

  private val BatchPrefix = "batch-"
  private val ManifestPrefix = "manifest-"
  /** Manifest entry kinds: live data vs merge-on-read tombstones. */
  val KindData = "data"
  val KindTombstone = "tombstone"

  /** Stable key-hash bucket column: `pmod(xxhash64(keys), n)`. Bucket-
    * partitioning a keyed table with this makes ANY key's partition a
    * pure function of the key — the contract [[upsert]]/[[applyCdc]]
    * need to find every incumbent row of a delta key without scanning
    * untouched partitions.
    */
  def keyBucket(keyCols: Seq[String], n: Int): Column = {
    require(n > 0, "bucket count must be positive")
    pmod(xxhash64(keyCols.map(col): _*), lit(n.toLong)).cast("int")
  }

  /** Canonical partition identity: partition values in `partCols`
    * order, NULL distinguished from every real value by a
    * non-printable marker.
    */
  def partKey(partCols: Seq[String], part: Map[String, String]): String =
    partCols.map(c => Option(part.getOrElse(c, null)).getOrElse("\u0000NULL"))
      .mkString("\u0001")

  private def hfs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Ids of committed snapshots (manifest `_SUCCESS` present), ascending. */
  def committedIds(spark: SparkSession, root: String): Seq[Long] = {
    val rootPath = new Path(root)
    val fs = hfs(spark, root)
    if (!fs.exists(rootPath)) Nil
    else
      fs.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(ManifestPrefix))
        .flatMap(s => s.getPath.getName.stripPrefix(ManifestPrefix).toLongOption
          .filter(_ => fs.exists(new Path(s.getPath, "_SUCCESS"))))
        .sorted
  }

  /** Load the manifest of snapshot `id` (must be committed). */
  def manifest(spark: SparkSession, root: String, id: Long): CowManifest = {
    val rows = spark.read.parquet(s"$root/$ManifestPrefix$id").collect()
    require(rows.nonEmpty, s"manifest $id at $root is empty — corrupt commit")
    val head = rows.head
    val partCols = head.getAs[scala.collection.Seq[String]]("part_cols").toSeq
    val ddl = head.getAs[String]("schema_ddl")
    val files = rows.toSeq.filter(_.getAs[String]("path") != null).map { r =>
      CowFile(
        path = r.getAs[String]("path"),
        part = Option(r.getAs[Map[String, String]]("part")).getOrElse(Map.empty),
        rows = r.getAs[Long]("rows"),
        bytes = r.getAs[Long]("bytes"),
        mins = Option(r.getAs[Map[String, String]]("mins")).getOrElse(Map.empty),
        maxs = Option(r.getAs[Map[String, String]]("maxs")).getOrElse(Map.empty),
        kind = r.getAs[String]("kind"),
        blooms = Option(
          r.getAs[Map[String, scala.collection.Seq[Long]]]("blooms"))
          .map(_.map { case (k, v) => k -> v.toSeq }).getOrElse(Map.empty))
    }
    CowManifest(id, partCols, ddl, files)
  }

  /** The current snapshot's manifest, if any commit exists. */
  def currentManifest(spark: SparkSession, root: String): Option[CowManifest] =
    committedIds(spark, root).lastOption.map(manifest(spark, root, _))

  /** The current table state (merge-on-read tombstones applied). */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentManifest(spark, root).map(m => resolved(spark, root, m, m.files))

  /** TIME TRAVEL: highest committed snapshot ≤ `id` (ids ARE versions). */
  def readAt(spark: SparkSession, root: String, id: Long): Option[DataFrame] =
    committedIds(spark, root).filter(_ <= id).lastOption
      .map(i => { val m = manifest(spark, root, i)
        resolved(spark, root, m, m.files) })

  /** CHANGE DATA FEED between two committed snapshots: the I/U/D
    * changelog that replays snapshot `fromId` into snapshot `toId`
    * (Delta's table_changes / Iceberg's changelog scan). Pure
    * composition of time travel with the snapshot-diff generator
    * ([[Cdc.changelog]]) — round-trip (apply(feed) == destination) is
    * already property-pinned at the operator level in CdcSpec.
    *
    * Cost note, stated plainly: this DIFFS the two snapshots (a
    * full-outer join over them), which is the honest fallback when the
    * writes between the ids were arbitrary. Pipelines that need
    * delta-sized feeds should emit their own changelogs at write time
    * (the batches they committed ARE the feed).
    */
  def changeFeed(
      spark: SparkSession,
      root: String,
      fromId: Long,
      toId: Long,
      keyCols: Seq[String],
      operCol: String = "oper"): DataFrame = {
    require(fromId <= toId, s"fromId $fromId > toId $toId")
    val before = readAt(spark, root, fromId).getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshot at or before $fromId under $root"))
    val after = readAt(spark, root, toId).getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshot at or before $toId under $root"))
    Cdc.changelog(before, after, keyCols, operCol)
  }

  /** MERGE-ON-READ resolution: the data files' rows minus any row a
    * tombstone of the same partitions names. The anti-join is on every
    * tombstone column (merge keys + partition values) and broadcasts
    * the tombstone side — outstanding tombstones are delete-batch-
    * sized, never table-sized, and [[foldTombstones]] retires them.
    */
  private def resolved(
      spark: SparkSession, root: String,
      m: CowManifest, dataFiles: Seq[CowFile]): DataFrame = {
    val df = dfFor(spark, root, m, dataFiles)
    val wanted = dataFiles.map(m.partKeyOf).toSet
    val tombs = m.tombstones.filter(t => wanted.contains(m.partKeyOf(t)))
    if (tombs.isEmpty) df
    else {
      val t = spark.read.parquet(tombs.map(f => s"$root/${f.path}"): _*)
      df.join(broadcast(t), t.columns.toSeq, "left_anti")
    }
  }

  /** DataFrame over an explicit subset of a manifest's files, read
    * under the MANIFEST's schema — older files missing newly-evolved
    * columns surface them as NULL without any footer-merging pass.
    */
  def dfFor(
      spark: SparkSession,
      root: String,
      m: CowManifest,
      files: Seq[CowFile]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], m.schema)
    else
      spark.read.schema(m.schema)
        .parquet(files.map(f => s"$root/${f.path}"): _*)

  // -------------------------------------------------------------------
  // Data skipping
  // -------------------------------------------------------------------

  /** Typed stats comparison: numerics compare as decimal values,
    * everything else in its Spark string form (date / timestamp /
    * boolean string forms are order-preserving). None = incomparable
    * (NaN, malformed) — callers must treat as "cannot skip".
    *
    * Strings compare as UNSIGNED UTF-8 BYTES, not Java chars: Spark's
    * UTF8String ordering is binary, and Java's UTF-16 code-unit
    * compareTo disagrees with it for supplementary characters (an
    * emoji sorts below U+FFFD in UTF-16 but above it in UTF-8) — a
    * char-order comparison here could prune a file whose rows the
    * residual filter would have kept.
    */
  private def statCompare(dt: DataType, a: String, b: String): Option[Int] =
    dt match {
      case _: NumericType =>
        try Some(BigDecimal(a).compare(BigDecimal(b)))
        catch { case _: NumberFormatException => None }
      case _ => Some(utf8Compare(a, b))
    }

  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Can any row of `f` satisfy `lo <= colName <= hi`? (Either bound
    * optional.) Missing stats ⇒ true — skipping is only ever an
    * optimization, never a filter.
    */
  private def mayMatch(
      schema: StructType, f: CowFile, colName: String,
      lo: Option[String], hi: Option[String]): Boolean = {
    val dt = schema.fields.find(_.name == colName).map(_.dataType)
      .getOrElse(return true)
    val belowLo = for {
      l <- lo; mx <- f.maxs.get(colName); c <- statCompare(dt, mx, l)
    } yield c < 0
    val aboveHi = for {
      h <- hi; mn <- f.mins.get(colName); c <- statCompare(dt, mn, h)
    } yield c > 0
    !(belowLo.getOrElse(false) || aboveHi.getOrElse(false))
  }

  /** Manifest-driven DATA-SKIPPING read: keep only files whose min/max
    * envelope can intersect `[lo, hi]` on `colName`, then apply the
    * predicate itself as a residual filter (so the result is EXACTLY
    * the full scan's — skipping can only remove provably-empty files,
    * `CowTableSpec` pins result-equality plus a strictly smaller
    * bytes-read via the metrics listener). Bounds are given in Spark
    * string form (`cast(col as string)`); pass both equal for a point
    * lookup. At 100 TB this is the scan path for selective queries: a
    * sorted or z-ordered layout makes most files' envelopes disjoint
    * from the predicate, and they are dropped from the FILE LIST —
    * never listed, opened, or footer-read.
    */
  def readWhereBetween(
      spark: SparkSession, root: String, colName: String,
      lo: Option[String], hi: Option[String]): DataFrame = {
    val m = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val schema = m.schema
    val kept = keptFiles(spark, m, colName, lo, hi)
    val df = resolved(spark, root, m, kept)
    // residual filter in the COLUMN's type (casting the column to
    // string would both break numeric ordering and block parquet
    // pushdown); the string bound round-trips through the same cast
    // that produced the stats
    val dt = schema.fields.find(_.name == colName)
      .map(_.dataType).getOrElse(StringType)
    val c = col(colName)
    def b(v: String) = lit(v).cast(dt)
    (lo, hi) match {
      case (Some(l), Some(h)) if l == h => df.where(c === b(l))
      case (Some(l), Some(h)) => df.where(c >= b(l) && c <= b(h))
      case (Some(l), None) => df.where(c >= b(l))
      case (None, Some(h)) => df.where(c <= b(h))
      case (None, None) => df
    }
  }

  /** Skipping file selection: min/max envelope test always; for a
    * POINT lookup (lo == hi) additionally the per-file Bloom filter
    * when the column carries one — the pruner for unsorted
    * high-cardinality columns whose envelopes span everything. Files
    * without a bloom are kept (skipping stays purely an optimization).
    */
  private def keptFiles(
      spark: SparkSession, m: CowManifest, colName: String,
      lo: Option[String], hi: Option[String]): Seq[CowFile] = {
    val byStats = m.files.filter(mayMatch(m.schema, _, colName, lo, hi))
    val point = lo.zip(hi).collectFirst { case (l, h) if l == h => l }
    point match {
      case Some(v) if byStats.exists(_.blooms.contains(colName)) =>
        val dt = m.schema.fields.find(_.name == colName)
          .map(_.dataType).getOrElse(StringType)
        val hashes = bloomHashesOf(spark, v, dt)
        if (hashes.isEmpty) byStats
        else byStats.filter(f => f.blooms.get(colName)
          .forall(words => bloomHasValue(words, hashes)))
      case _ => byStats
    }
  }

  /** Files the skipping read would keep — for asserting skip counts. */
  def filesForRange(
      spark: SparkSession, root: String, colName: String,
      lo: Option[String], hi: Option[String]): Seq[CowFile] = {
    val m = currentManifest(spark, root).getOrElse(return Nil)
    keptFiles(spark, m, colName, lo, hi)
  }

  // -------------------------------------------------------------------
  // Commit
  // -------------------------------------------------------------------

  /** Stats-eligible columns: orderable atomics whose min/max fit a
    * small manifest cell. Arrays/maps/structs/binary carry no usable
    * envelope; long strings are handled at collection time (min
    * truncated — still a valid lower bound; max dropped — a truncated
    * upper bound would be unsound).
    */
  private def statCols(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
      case f if f.dataType == StringType || f.dataType == BooleanType ||
        f.dataType == DateType || f.dataType == TimestampType ||
        f.dataType == TimestampNTZType => f.name
    }

  private val MaxStatLen = 64

  // Per-file Bloom filter geometry: 2^17 bits (16 KiB as 2048 longs)
  // per column per file, 4 hashes — false-positive rate < 1e-6 up to
  // ~4k distinct values/file and still a useful ~5% at ~40k. An
  // oversaturated filter on a huge file degrades to "keep the file":
  // wasted read, never wrong results. The BIT COUNT is self-describing
  // on read (m = stored word count × 64) and may change between
  // commits; the HASH COUNT is not stored — BloomHashes may only ever
  // be LOWERED (old files set bits for the original k; requiring more
  // would false-negative on them, the one hazard this design forbids).
  private val BloomBits = 1 << 17
  private val BloomWords = BloomBits / 64
  private val BloomHashes = 4

  /** The raw `xxhash64(k, value)` hashes of a lookup value — computed
    * BY SPARK (one 1-row job) so the read side can never drift from
    * the write side's `xxhash64(k, cast(col as string))`; reduced
    * modulo each FILE's own filter size at check time.
    *
    * The bound is CANONICALIZED through the column's own type first
    * (`cast(cast(v as dt) as string)`): the write side hashed the
    * column's cast-to-string form, so a numerically-equal but
    * non-canonical bound ("1500" probing a DOUBLE column that stores
    * "1500.0") must be normalized or the bloom would wrongly prune the
    * live file — the envelope layer's BigDecimal compare is tolerant
    * of exactly this, and the two pruners must agree.
    */
  private def bloomHashesOf(
      spark: SparkSession, value: String, dt: DataType): Seq[Long] = {
    val canon = lit(value).cast(dt).cast("string")
    val row = spark.range(1).select(
      (0 until BloomHashes).map(k => xxhash64(lit(k), canon)): _*)
      .first()
    if (row.anyNull) Nil // uncastable bound: no bloom pruning
    else (0 until BloomHashes).map(row.getLong)
  }

  private def bloomHasValue(words: Seq[Long], hashes: Seq[Long]): Boolean = {
    val m = words.size.toLong * 64
    m > 0 && hashes.forall { h =>
      val p = java.lang.Math.floorMod(h, m)
      ((words((p / 64).toInt) >>> (p % 64).toInt) & 1L) == 1L
    }
  }

  /** Collect per-file (path, bytes, rows, min/max, partition values)
    * for everything under `batchDir` — ONE Spark job over the files
    * just written, using the `_metadata` column so path and size come
    * from the same source (no listing-string join to mismatch).
    */
  /** One bloom word: the bit_or over the file's rows of each row's
    * contributions to word `w` — a row sets `BloomHashes` bits, each
    * lands in some word; this expression collects word `w`'s share.
    * Pure scan-stage arithmetic inside the same grouped aggregate as
    * the min/max stats — no extra pass.
    */
  /** Per-file Bloom words for `bloomCols`, one extra delta-sized pass
    * per column: explode each row's `BloomHashes` bit positions, OR
    * them per (file, word) — sparse, so the shuffle carries at most
    * min(4·rows, BloomWords) entries per file — then densify driver-
    * side. Separate from the min/max aggregate because a per-word CASE
    * in that one grouped agg would mean BloomWords×BloomHashes codegen
    * terms.
    */
  private def collectBlooms(
      spark: SparkSession, batchDir: String, schema: StructType,
      bloomCols: Seq[String]): Map[(String, String), Seq[Long]] =
    bloomCols.flatMap { c =>
      val positions = array((0 until BloomHashes).map(k =>
        pmod(xxhash64(lit(k), col(c).cast("string")),
          lit(BloomBits.toLong))): _*)
      spark.read.schema(schema).parquet(batchDir)
        .where(col(c).isNotNull)
        .select(col("_metadata.file_path").as("__fp"),
          explode(positions).as("__pos"))
        .groupBy(col("__fp"),
          expr("CAST(__pos div 64 AS INT)").as("__w"))
        .agg(expr(
          "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT)))")
          .as("__bits"))
        .collect()
        .groupBy(_.getAs[String]("__fp"))
        .map { case (fp, rs) =>
          val words = Array.fill(BloomWords)(0L)
          rs.foreach(r =>
            words(r.getAs[Int]("__w")) |= r.getAs[Long]("__bits"))
          (fp, c) -> words.toSeq
        }
    }.toMap

  private def collectEntries(
      spark: SparkSession, batchDir: String, id: Long,
      schema: StructType, partCols: Seq[String],
      bloomCols: Seq[String] = Nil): Seq[CowFile] = {
    val fs = hfs(spark, batchDir)
    val anyData = fs.exists(new Path(batchDir)) &&
      Compaction.tableBytes(spark, batchDir) > 0
    if (!anyData) return Nil
    val cols = schema.fieldNames.toSeq
    val sc = statCols(schema)
    partCols.foreach(c => require(sc.contains(c),
      s"partition column $c must be an orderable atomic type"))
    bloomCols.foreach(c => require(cols.contains(c),
      s"bloom column $c is not a table column"))
    val aggs = count(lit(1)).as("__rows") +:
      max(col("_metadata.file_size")).as("__bytes") +:
      sc.flatMap(c => Seq(
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")))
    val rows = spark.read.schema(schema).parquet(batchDir)
      .select(col("_metadata.file_path").as("__fp") +: cols.map(col): _*)
      .groupBy(col("__fp"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val bloomsByFile = collectBlooms(spark, batchDir, schema, bloomCols)
    val marker = s"/$BatchPrefix$id/"
    val isStr = sc.filter(c =>
      schema.fields.find(_.name == c).exists(_.dataType == StringType)).toSet
    rows.toSeq.map { r =>
      val full = r.getAs[String]("__fp")
      val cut = full.indexOf(marker)
      require(cut >= 0, s"file $full not under $BatchPrefix$id")
      val mins = sc.flatMap { c =>
        Option(r.getAs[String](s"__min_$c")).map { v =>
          c -> (if (isStr(c) && v.length > MaxStatLen) v.take(MaxStatLen) else v)
        }
      }.toMap
      val maxs = sc.flatMap { c =>
        Option(r.getAs[String](s"__max_$c"))
          .filter(v => !isStr(c) || v.length <= MaxStatLen)
          .map(c -> _)
      }.toMap
      val blooms = bloomCols.flatMap(c =>
        bloomsByFile.get((full, c)).map(c -> _)).toMap
      CowFile(
        path = full.substring(cut + 1),
        part = partCols.map(c => c -> r.getAs[String](s"__min_$c")).toMap,
        rows = r.getAs[Long]("__rows"),
        bytes = r.getAs[Long]("__bytes"),
        mins = mins,
        maxs = maxs,
        blooms = blooms)
    }
  }

  private def writeBatch(
      rewrite: DataFrame, batchDir: String,
      partCols: Seq[String], sortCols: Seq[String]): Unit = {
    if (partCols.isEmpty) {
      val out = if (sortCols.nonEmpty)
        rewrite.sortWithinPartitions(sortCols.map(col): _*) else rewrite
      out.write.mode("overwrite").parquet(batchDir)
    } else {
      val gp = partCols.map(c => s"__gp_$c")
      // duplicated __gp_* drive the directory layout; the REAL columns
      // stay in the files (self-contained reads, no dir-name parsing)
      val dup = rewrite.select(
        col("*") +: partCols.map(c => col(c).as(s"__gp_$c")): _*)
      // one task per touched partition value: a delta-sized batch
      // writes one file per partition (compaction handles the
      // long-run file-count story, Compaction.scala)
      val shaped = dup.repartition(gp.map(col): _*)
      val sorted = if (sortCols.nonEmpty)
        shaped.sortWithinPartitions((gp ++ sortCols).map(col): _*)
      else shaped
      sorted.write.mode("overwrite").partitionBy(gp: _*).parquet(batchDir)
    }
  }

  private def writeManifest(
      spark: SparkSession, root: String, id: Long,
      partCols: Seq[String], ddl: String, files: Seq[CowFile]): Unit = {
    import spark.implicits._
    val rows =
      if (files.isEmpty)
        Seq(CowManifestRow(null, Map.empty, 0L, 0L, Map.empty, Map.empty,
          partCols, ddl, KindData, Map.empty))
      else files.map(f => CowManifestRow(
        f.path, f.part, f.rows, f.bytes, f.mins, f.maxs, partCols, ddl,
        f.kind, f.blooms))
    rows.toDS().repartition(1).write.mode("overwrite")
      .parquet(s"$root/$ManifestPrefix$id")
  }

  /** Commit `rewrite` as the FULL new content of the partitions whose
    * canonical keys are in `touched`; every other partition carries
    * over from the previous snapshot by reference. A touched partition
    * with no rows in `rewrite` is thereby DELETED. Initial commit
    * (no previous snapshot): `touched` is ignored, `rewrite` is the
    * whole table.
    */
  def commitPartitions(
      rewrite: DataFrame,
      touched: Set[String],
      root: String,
      id: Long,
      partCols: Seq[String],
      keep: Int = 2,
      sortCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Unit = {
    require(keep >= 1, "must keep at least the current snapshot")
    val spark = rewrite.sparkSession
    val prev = currentManifest(spark, root)
    // replay guard — see scaladoc: rewriting a committed batch's files
    // would rename them out from under later manifests
    if (prev.exists(_.id >= id)) return
    prev.foreach { p =>
      require(p.partCols == partCols,
        s"partitioning changed: ${p.partCols} -> $partCols (rewrite the " +
          "table via a fresh root to repartition)")
      val missing = p.schema.fieldNames.toSeq
        .filterNot(rewrite.schema.fieldNames.contains)
      require(missing.isEmpty,
        s"schema may only grow: previous columns $missing absent from rewrite")
      p.schema.fields.foreach { f =>
        rewrite.schema.fields.find(_.name == f.name).foreach(nf =>
          require(nf.dataType == f.dataType,
            s"column ${f.name} changed type ${f.dataType} -> ${nf.dataType}"))
      }
    }
    val batchDir = s"$root/$BatchPrefix$id"
    writeBatch(rewrite, batchDir, partCols, sortCols)
    // bloom columns INHERIT from the previous snapshot when the caller
    // doesn't name any: a table committed with blooms must not quietly
    // lose its point-lookup pruning every time a merge or fold
    // rewrites a partition
    val effBloomCols =
      if (bloomCols.nonEmpty) bloomCols
      else prev.toSeq.flatMap(_.files.flatMap(_.blooms.keys)).distinct
        .filter(rewrite.schema.fieldNames.contains)
    val fresh = collectEntries(spark, batchDir, id, rewrite.schema, partCols,
      effBloomCols)
    // carry untouched DATA files and untouched partitions' tombstones;
    // a touched partition's tombstones retire here — its rewrite was
    // computed from the RESOLVED base, so they are folded in
    val carried = prev.map(p =>
      p.allFiles.filterNot(f => touched.contains(p.partKeyOf(f)))
    ).getOrElse(Nil)
    writeManifest(spark, root, id, partCols, rewrite.schema.toDDL,
      fresh ++ carried)
    vacuum(spark, root, keep)
  }

  /** Commit `df` as a complete snapshot (initial load, restatement, or
    * compaction) — every partition is new; nothing carries over.
    */
  def commitFull(
      df: DataFrame, root: String, id: Long, partCols: Seq[String],
      keep: Int = 2, sortCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Unit = {
    val allTouched = currentManifest(df.sparkSession, root)
      .map(p => p.allFiles.map(p.partKeyOf).toSet).getOrElse(Set.empty)
    commitPartitions(df, allTouched, root, id, partCols, keep, sortCols,
      bloomCols)
  }

  // -------------------------------------------------------------------
  // Incremental merge entry points
  // -------------------------------------------------------------------

  /** Canonical keys of the partitions a delta lands in. Values come
    * from the same Spark string-cast that stamps manifest entries, so
    * the two sides can never drift (driver-side toString of a
    * collected Timestamp would).
    */
  private def touchedKeys(
      delta: DataFrame, partCols: Seq[String]): Set[String] =
    delta.select(partCols.map(c => col(c).cast("string")): _*)
      .distinct().collect()
      .map(r => partKey(partCols,
        partCols.zipWithIndex.map { case (c, i) => c -> r.getString(i) }.toMap))
      .toSet

  private def baseFor(
      spark: SparkSession, root: String,
      m: CowManifest, touched: Set[String]): DataFrame =
    resolved(spark, root, m,
      m.files.filter(f => touched.contains(m.partKeyOf(f))))

  /** COPY-ON-WRITE MERGE: [[Merge.upsert]] of `delta` into the table,
    * rewriting ONLY the partitions the delta touches.
    *
    * CONTRACT: every `partCols` value must be a pure function of the
    * merge keys (date extracted from an immutable event time, or
    * [[keyBucket]] over the keys) — that is what guarantees a delta
    * key's incumbent row lives in one of the delta's own partitions,
    * so untouched partitions need not even be read. A key whose
    * partition value could drift between versions would leave its old
    * row stranded in an unread partition; use bucket partitioning for
    * such tables.
    *
    * Cost: O(delta) + O(touched partitions), independent of table
    * size — the property [[SnapshotTarget]] could not offer.
    */
  def upsert(
      spark: SparkSession,
      root: String,
      id: Long,
      delta: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String],
      versionCol: Option[String] = None,
      keep: Int = 2,
      sortCols: Seq[String] = Nil): Unit = {
    if (committedIds(spark, root).exists(_ >= id)) return
    val touched = touchedKeys(delta, partCols)
    val outCols = delta.columns.toSeq.filterNot(versionCol.contains)
    val merged = currentManifest(spark, root) match {
      case None =>
        Merge.upsert(delta.select(outCols.map(col): _*).limit(0), delta,
          keyCols, versionCol)
      case Some(m) =>
        Merge.upsert(baseFor(spark, root, m, touched), delta,
          keyCols, versionCol)
    }
    commitPartitions(merged, touched, root, id, partCols, keep, sortCols)
  }

  /** COPY-ON-WRITE CDC apply: [[Cdc.apply]] (I/U/D, newest-wins) over
    * only the touched partitions. Same key-stable partitioning
    * contract as [[upsert]] — D rows must carry the key's partition
    * value (automatic when it derives from the key).
    */
  def applyCdc(
      spark: SparkSession,
      root: String,
      id: Long,
      batch: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String],
      operCol: String = "oper",
      versionCol: Option[String] = None,
      keep: Int = 2,
      sortCols: Seq[String] = Nil): Unit = {
    if (committedIds(spark, root).exists(_ >= id)) return
    val touched = touchedKeys(batch, partCols)
    val outCols = batch.columns.toSeq
      .filterNot(c => c == operCol || versionCol.contains(c))
    val base = currentManifest(spark, root) match {
      case None => batch.select(outCols.map(col): _*).limit(0)
      case Some(m) => baseFor(spark, root, m, touched)
    }
    val merged = Cdc.apply(base, batch, keyCols, operCol, versionCol)
    commitPartitions(merged, touched, root, id, partCols, keep, sortCols)
  }

  /** KEYED POINT LOOKUP: the rows of `keys` (which must carry the
    * table's `partCols`, computed with the same key-derived expression
    * the writes use — e.g. [[keyBucket]]) joined against ONLY the
    * partitions those keys land in. The read cost is O(touched
    * buckets + keys), not O(table): the manifest prunes the file list
    * to the keys' buckets before Spark lists anything, and the
    * semi-join inside those buckets broadcasts the (small) key set.
    * This is the serving-path read a 100 TB keyed table needs —
    * "fetch these 10k customers" touches 10k/bucket-count of the
    * table's partitions, proven byte-wise in `CowTableSpec`.
    */
  def lookupKeys(
      spark: SparkSession,
      root: String,
      keys: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String]): DataFrame = {
    val m = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val touched = touchedKeys(keys, partCols)
    baseFor(spark, root, m, touched)
      .join(broadcast(keys.select(keyCols.map(col): _*).distinct()),
        keyCols, "left_semi")
  }

  /** COPY-ON-WRITE SCD-2 CDC: [[Merge.scd2Cdc]] (close-and-insert
    * history, deletes, rebirths) over only the touched partitions.
    *
    * The partitioning contract is STRICTER than [[upsert]]'s: a key's
    * ENTIRE version history must live in one partition, because the
    * merge needs the key's open version and closed frontier. A
    * [[keyBucket]] over the merge keys satisfies this; an
    * effective-date partition does NOT (versions of one key span
    * dates). First batch bootstraps an empty SCD-2 target from the
    * change schema, like the streaming sink.
    *
    * This gives the SCD-2 dimension the same cost shape as the SCD-1
    * table: a daily change batch rewrites O(touched buckets) of
    * history, never the dimension — and [[Merge.scd2Restate]] composes
    * the same way (restate the affected buckets, commit them as one
    * batch via [[commitPartitions]]).
    */
  def applyScd2Cdc(
      spark: SparkSession,
      root: String,
      id: Long,
      changes: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String],
      effCol: String,
      operCol: String = "oper",
      keep: Int = 2,
      sortCols: Seq[String] = Nil): Unit = {
    if (committedIds(spark, root).exists(_ >= id)) return
    val touched = touchedKeys(changes, partCols)
    val base = currentManifest(spark, root) match {
      case None =>
        val dataCols = changes.columns.toSeq
          .filterNot(c => c == operCol || c == effCol)
        changes.select(dataCols.map(col) ++ Seq(
          col(effCol).as("effective_from"),
          lit(null).cast(changes.schema(effCol).dataType).as("effective_to"),
          lit(true).as("is_current")): _*).limit(0)
      case Some(m) => baseFor(spark, root, m, touched)
    }
    val merged = Merge.scd2Cdc(base, changes, keyCols, effCol, operCol)
    commitPartitions(merged, touched, root, id, partCols, keep, sortCols)
  }

  /** BUCKET-SCOPED SCD-2 RESTATEMENT — [[Merge.scd2Restate]] composed
    * with the COW table, the composition its scaladoc promises: only
    * the buckets holding corrected keys decompile + rebuild their
    * history; every other bucket's files carry over untouched. This is
    * what makes restatement operable at dimension scale — a correction
    * batch touching 100 keys costs O(their buckets' history), not a
    * full-history rewrite.
    */
  def restateScd2(
      spark: SparkSession,
      root: String,
      id: Long,
      corrections: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String],
      effCol: String,
      operCol: String = "oper",
      keep: Int = 2): Unit = {
    if (committedIds(spark, root).exists(_ >= id)) return
    val m = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    val touched = touchedKeys(corrections, partCols)
    val restated = Merge.scd2Restate(
      baseFor(spark, root, m, touched), corrections, keyCols, effCol, operCol)
    commitPartitions(restated, touched, root, id, partCols, keep)
  }

  /** Metadata-only row count: the manifest already knows every data
    * file's row count, so a tombstone-free table answers `count(*)`
    * without touching a single data file — the aggregate-pushdown
    * trick table formats use. None when tombstones are outstanding
    * (their matched-row counts are unknown until a read or fold).
    */
  def countRows(spark: SparkSession, root: String): Option[Long] =
    currentManifest(spark, root).flatMap(m =>
      if (m.tombstones.nonEmpty) None else Some(m.files.map(_.rows).sum))

  /** Metadata-only global (min, max) of a column, in Spark string
    * form: the fold of the per-file envelopes. An absent per-file
    * stat means UNKNOWN, so the fold is only sound when every file
    * reports — None when any file lacks the stat (unsupported type,
    * long-string max dropped, all-NULL file), when any pair is
    * incomparable (NaN), or when tombstones are outstanding (a
    * deleted row may BE the extreme).
    */
  def minMaxOf(
      spark: SparkSession, root: String, colName: String): Option[(String, String)] =
    currentManifest(spark, root).flatMap { m =>
      val dtOpt = m.schema.fields.find(_.name == colName).map(_.dataType)
      (dtOpt, m.tombstones.isEmpty && m.files.nonEmpty) match {
        case (Some(dt), true) =>
          def fold(vals: Seq[Option[String]], keepLeft: Int => Boolean) =
            if (vals.exists(_.isEmpty)) None
            else vals.flatten.foldLeft(Option(vals.flatten.head)) {
              case (Some(a), b) =>
                statCompare(dt, a, b).map(c => if (keepLeft(c)) a else b)
              case (None, _) => None
            }
          for {
            lo <- fold(m.files.map(_.mins.get(colName)), _ <= 0)
            hi <- fold(m.files.map(_.maxs.get(colName)), _ >= 0)
          } yield (lo, hi)
        case _ => None
      }
    }

  // -------------------------------------------------------------------
  // Merge-on-read deletes
  // -------------------------------------------------------------------

  /** MERGE-ON-READ delete — the write-amplification escape hatch
    * copy-on-write lacks: deleting k rows from a partition holding
    * millions costs a k-row TOMBSTONE file, not a partition rewrite
    * (Delta's deletion vectors / Iceberg's merge-on-read, at key
    * granularity). Readers subtract tombstones via a broadcast
    * anti-join ([[resolved]]); the debt retires automatically when the
    * partition next rewrites (COW folds the resolved base) or
    * explicitly via [[foldTombstones]].
    *
    * `keys` must carry the merge keys AND the table's `partCols`
    * (key-derived, as everywhere in this API) — a tombstone names its
    * partition so reads outside it never pay the anti-join. NULL-keyed
    * rows never match (ANSI), so they cannot be MOR-deleted.
    *
    * Trade-off, stated plainly: every read between the delete and the
    * next fold pays a broadcast anti-join against the outstanding
    * tombstones. That is delete-batch-sized work; fold when
    * tombstone bytes grow past a few percent of their partitions.
    */
  def deleteKeysMor(
      spark: SparkSession,
      root: String,
      id: Long,
      keys: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String],
      keep: Int = 2): Unit = {
    if (committedIds(spark, root).exists(_ >= id)) return
    val m = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    require(m.partCols == partCols,
      s"partitioning mismatch: table has ${m.partCols}, got $partCols")
    val cols = (keyCols ++ partCols).distinct
    cols.foreach(c => require(m.schema.fieldNames.contains(c),
      s"tombstone column $c is not a table column"))
    val tombSchema = StructType(cols.map(c => m.schema(c)))
    val tombDir = s"$root/$BatchPrefix$id/__tomb"
    writeBatch(keys.select(cols.map(col): _*).distinct(),
      tombDir, partCols, Nil)
    val fresh = collectEntries(spark, tombDir, id, tombSchema, partCols)
      .map(_.copy(kind = KindTombstone))
    // deletes only ADD: every previous entry (data and tombstones)
    // carries over verbatim
    writeManifest(spark, root, id, partCols, m.schemaDdl,
      m.allFiles ++ fresh)
    vacuum(spark, root, keep)
  }

  /** Retire all outstanding tombstones by rewriting exactly the
    * partitions that have any: the COW state afterwards is tombstone-
    * free and scans stop paying the anti-join. Returns false (no
    * commit, id unconsumed) when there is nothing to fold.
    */
  def foldTombstones(
      spark: SparkSession, root: String, id: Long, keep: Int = 2): Boolean = {
    if (committedIds(spark, root).exists(_ >= id)) return false
    val m = currentManifest(spark, root).getOrElse(return false)
    val touched = m.tombstones.map(m.partKeyOf).toSet
    if (touched.isEmpty) return false
    val rewrite = resolved(spark, root, m,
      m.files.filter(f => touched.contains(m.partKeyOf(f))))
    commitPartitions(rewrite, touched, root, id, m.partCols, keep)
    true
  }

  // -------------------------------------------------------------------
  // Retention
  // -------------------------------------------------------------------

  /** Drop manifests beyond the newest `keep`, any uncommitted manifest
    * partial behind the commit frontier, and every batch directory no
    * retained manifest references (old COW'd-away files AND crash-
    * orphaned uncommitted batches behind the frontier).
    */
  def vacuum(spark: SparkSession, root: String, keep: Int): Unit = {
    val ids = committedIds(spark, root)
    val newest = ids.lastOption.getOrElse(return)
    val retained = ids.takeRight(keep)
    val cutoff = retained.head
    val committed = ids.toSet
    val fs = hfs(spark, root)
    // manifests: same pruning rule as SnapshotTarget
    fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(ManifestPrefix))
      .filter(_.getPath.getName.stripPrefix(ManifestPrefix).toLongOption
        .exists(i => if (committed(i)) i < cutoff else i < newest))
      .foreach(s => fs.delete(s.getPath, true))
    // batch dirs: referenced-by-any-retained-manifest is the liveness
    // rule — tombstone references count (a batch dir may hold only
    // tombstones)
    val liveBatches = retained
      .flatMap(i => manifest(spark, root, i).allFiles.map(_.path))
      .flatMap(p => p.split("/").headOption
        .flatMap(_.stripPrefix(BatchPrefix).toLongOption))
      .toSet
    fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(BatchPrefix))
      .filter(_.getPath.getName.stripPrefix(BatchPrefix).toLongOption
        .exists(i => i < newest && !liveBatches.contains(i)))
      .foreach(s => fs.delete(s.getPath, true))
  }
}
