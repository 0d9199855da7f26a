package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.sinks.CowTable

/** The committed CHANGE FEED of a cow table as a NAMED streaming
  * source — `spark.readStream.table("cow.<ns>.<table>.changes")` (or
  * the backticked path form with the same `.changes` suffix; the BARE
  * table name streams the table itself — [[CowTableStream]]) yields
  * the table's signed D/I changelog with `_oper` and `_commit_id`
  * columns, one micro-batch offset per COMMITTED snapshot id. This replaces the raw
  * `readStream.parquet(root/_changes/[0-9]*)` transport: streaming
  * consumers now use NAMES exactly like the batch surface, and the
  * publish→manifest race is closed STRUCTURALLY — offsets only ever
  * advance to committed ids, so a sidecar published by a writer whose
  * manifest hasn't landed is simply not yet in range (the file-stream
  * transport could list it mid-race and needed a bounded wait;
  * orphaned sidecars of crashed writers never enter the feed at all,
  * because a dead id never joins `committedIds`).
  *
  * OFFSETS are commit ids ([[CowFeedOffset]]): batch (start, end]
  * serves the sidecar directories of the committed ids in that range.
  * A committed id whose commit carried no `changeLogKeys` has no
  * sidecar and contributes no rows — same blindness as the transport
  * it replaces; keep feed tables on sidecar-emitting write paths
  * (`changeLogRequired` on the streaming sink makes it structural).
  *
  * RETENTION: when vacuum prunes past a lagging stream's position
  * (`start` behind the lowest retained id), the missing range is
  * unknowable — committed-then-vacuumed is indistinguishable from
  * never-committed — so the batch FAILS loudly, the same contract as
  * `CowStream`'s liveIds guard; register a vacuum fence
  * (`CowTable.registerStreamFrontier`) to pin retention structurally.
  *
  * DATA PATH: each partition is one sidecar file read by Spark's own
  * parquet reader (`Bridge.parquetRowReader` — schema coercion and
  * vectorization included), with `_commit_id` appended as a
  * partition value; the driver handles only file listings.
  */
final case class CowFeedTable(feedName: String, root: String,
    tableSchema: StructType)
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead {

  override def name(): String = feedName

  override def schema(): StructType = tableSchema
    .add(CowTable.ChangeOper, StringType)
    .add("_commit_id", LongType, nullable = false)

  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability
        .MICRO_BATCH_READ,
      org.apache.spark.sql.connector.catalog.TableCapability
        .BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new CowFeedScanBuilder(root, tableSchema, options)
}

final class CowFeedScanBuilder(root: String, schema: StructType,
    options: CaseInsensitiveStringMap) extends ScanBuilder {
  override def build(): Scan = new CowFeedScan(root, schema, options)
}

final class CowFeedScan(root: String, tableSchema: StructType,
    options: CaseInsensitiveStringMap) extends Scan {

  override def readSchema(): StructType = tableSchema
    .add(CowTable.ChangeOper, StringType)
    .add("_commit_id", LongType, nullable = false)

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new CowChangeFeedStream(SparkSession.active, root, tableSchema,
      Option(options.get("startingSnapshot")).map(_.toLong))

  /** The same change feed as a BATCH read — Delta's `table_changes`:
    * `spark.read.option("startSnapshot", a).option("endSnapshot", b)
    * .table("cow.ns.t.changes")` serves the signed changelog of the
    * committed ids in `[a, b]` (both INCLUSIVE; defaults: everything
    * retained → the current head). The same retention contract as the
    * stream: a start behind the lowest retained snapshot fails loudly
    * rather than silently serving a hole.
    */
  override def toBatch: org.apache.spark.sql.connector.read.Batch = {
    val spark = SparkSession.active
    val committed = CowTable.committedIds(spark, root)
    val startIncl = Option(options.get("startSnapshot")).map(_.toLong)
    val end = Option(options.get("endSnapshot")).map(_.toLong)
      .orElse(committed.lastOption).getOrElse(0L)
    // lo is EXCLUSIVE (stream-offset convention); default = serve all
    val lo = startIncl.map(_ - 1L)
      .orElse(committed.headOption.map(_ - 1L)).getOrElse(0L)
    val parts = CowFeedPlanner.partitionsFor(spark, root, lo, end)
    val factory = new CowFeedReaderFactory(
      org.apache.spark.sql.graftbridge.Bridge.parquetRowReader(
        spark, tableSchema.add(CowTable.ChangeOper, StringType),
        StructType(Nil).add("_commit_id", LongType, nullable = false),
        Map.empty))
    new org.apache.spark.sql.connector.read.Batch {
      override def planInputPartitions(): Array[InputPartition] = parts
      override def createReaderFactory(): PartitionReaderFactory = factory
    }
  }

  override def description(): String = s"cow change feed at $root"
}

final case class CowFeedOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

final class CowChangeFeedStream(spark: SparkSession, root: String,
    tableSchema: StructType, startingSnapshot: Option[Long])
  extends MicroBatchStream {

  // sidecar files hold table columns + _oper; _commit_id rides in as
  // the (virtual) partition value of each id's directory
  private val dataSchema =
    tableSchema.add(CowTable.ChangeOper, StringType)
  private val partSchema =
    StructType(Nil).add("_commit_id", LongType, nullable = false)

  // startingSnapshot is INCLUSIVE — commit X's changes are served —
  // matching the table stream's same-named option and the batch CDF's
  // startSnapshot; offsets are (start, end], so the initial offset is
  // want - 1 (a CDC consumer passing the first id it needs must
  // receive that id's changes, not silently start after them)
  override def initialOffset(): Offset =
    CowFeedOffset(startingSnapshot.map(_ - 1L).getOrElse(
      // serve everything still retained at stream genesis — the same
      // coverage the file-stream transport's initial listing gave
      CowTable.committedIds(spark, root).headOption.map(_ - 1L)
        .getOrElse(0L)))

  override def latestOffset(): Offset =
    CowFeedOffset(CowTable.committedIds(spark, root).lastOption
      .getOrElse(startingSnapshot.map(_ - 1L).getOrElse(0L)))

  override def deserializeOffset(json: String): Offset =
    CowFeedOffset(json.toLong)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] =
    CowFeedPlanner.partitionsFor(spark, root,
      start.asInstanceOf[CowFeedOffset].id,
      end.asInstanceOf[CowFeedOffset].id)

  override def createReaderFactory(): PartitionReaderFactory =
    new CowFeedReaderFactory(
      org.apache.spark.sql.graftbridge.Bridge.parquetRowReader(
        spark, dataSchema, partSchema, Map.empty))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Sidecar listing shared by the STREAMING and BATCH feed reads: one
  * input partition per sidecar file of each committed id in
  * `(lo, hi]`.
  */
private[streaming] object CowFeedPlanner {

  def partitionsFor(spark: SparkSession, root: String,
      lo: Long, hi: Long): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val committed = CowTable.committedIds(spark, root)
    // retention guard (see scaladoc): a range start BEHIND the vacuum
    // high-water mark has provably missed committed-then-vacuumed ids
    // (vacuum records the highest committed id it prunes as a
    // create-only marker BEFORE deleting — CowTable.vacuumHwm). The
    // marker, not lowest-retained-minus-one, is the test: a table
    // whose id space simply starts above the requested lo (e.g. the
    // streaming sink's first commit is id 2) was never vacuumed and a
    // from-the-beginning request is legitimate.
    if (committed.headOption.exists(lowest => lo < lowest - 1L) &&
        CowTable.vacuumHwm(spark, root).exists(_ > lo))
      throw new IllegalStateException(
        s"change feed at $root lags vacuumed history: range " +
          s"start $lo is behind vacuumed commits (high-water mark " +
          s"${CowTable.vacuumHwm(spark, root).get}) — rebuild the " +
          "consumer from a table rescan, raise the writer's keep, " +
          "or register a stream frontier fence")
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    // ids whose _changes dir probe came back absent: EITHER a commit
    // that carried no changeLogKeys (legitimately nothing to serve) OR
    // a vacuum that pruned the id — manifest first, then sidecars —
    // between our committedIds listing above and the probe. Serving
    // "nothing" for a vacuumed id would advance the offset past real
    // changes with no error, so the two must be told apart
    val sidecarless = scala.collection.mutable.ArrayBuffer.empty[Long]
    val parts: Array[InputPartition] =
      committed.filter(i => i > lo && i <= hi).flatMap { id =>
        val dir = new Path(s"$root/${CowTable.ChangesDir}/$id")
        if (!fs.exists(dir)) { sidecarless += id; Nil }
        else fs.listStatus(dir).toSeq
          .filter(st => !st.isDirectory &&
            !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(st => CowFeedPartition(id, st.getPath.toString, st.getLen))
      }.toArray
    if (sidecarless.nonEmpty) {
      // one re-listing decides all of them: vacuum deletes an id's
      // manifest STRICTLY BEFORE its _changes dir (see CowTable
      // .vacuum), so an id still committed after its dir probed absent
      // really had no sidecar; one whose manifest is now gone was
      // vacuumed out from under this batch
      val still = CowTable.committedIds(spark, root).toSet
      val lost = sidecarless.filterNot(still.contains)
      if (lost.nonEmpty) throw new IllegalStateException(
        s"change feed at $root raced a vacuum: commit(s) " +
          s"${lost.mkString(", ")} were pruned (manifest and change " +
          "sidecars deleted) while this range was being planned — " +
          "rebuild the consumer from a table rescan, raise the " +
          "writer's keep, or register a stream frontier fence")
    }
    parts
  }
}

final case class CowFeedPartition(commitId: Long, filePath: String,
    length: Long) extends InputPartition

private[streaming] final class CowFeedReaderFactory(
    read: (String, Long, InternalRow) => Iterator[InternalRow],
    partValues: Boolean = true)
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CowFeedPartition]
    // the stock reader yields ColumnarBatch objects DISGUISED as rows
    // when vectorized (the documented wart of buildReader*) — the cast
    // through Any flattens them to rows (reused buffers; Spark's
    // consumers copy when they buffer, same contract as FileScanRDD)
    val rows = read(p.filePath, p.length,
      if (partValues) InternalRow(p.commitId) else InternalRow.empty)
      .asInstanceOf[Iterator[Any]].flatMap {
        case b: ColumnarBatch => b.rowIterator().asScala
        case r: InternalRow => Iterator.single(r)
      }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
