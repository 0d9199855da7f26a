package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.CowTable

/** EXACTLY-ONCE STREAMING SINK into a [[CowTable]] — the write half of
  * the storage↔streaming loop ([[CowStream]] is the read half): a
  * `foreachBatch` writer that maps the checkpoint's micro-batch id
  * into the table's id space (see [[idOf]]: data commits on EVEN ids
  * `2b+2`, in-band maintenance on odd ids `2b+3`). Exactly-once
  * falls out of the table's own commit protocol, with NO sink-side
  * state: every commit path first checks the committed-id frontier and
  * returns without writing when `id <= frontier`, so a crash-replayed
  * micro-batch (same id, same deterministic source slice) is a no-op —
  * the same contract the MV sink and [[StreamOps.upsertBatch]] pin.
  *
  * ID-SPACE OWNERSHIP: the sink derives commit ids from the stream's
  * checkpoint, so the sink OWNS the table's id space — interleaving
  * other writers would collide ids (the commit lease makes the loser
  * fail loudly, never corrupt). Run maintenance (compaction, vacuum)
  * between stream runs, or from the stream itself.
  *
  * At 100 TB this is the ingestion front door: each micro-batch lands
  * as one O(batch) append commit (optionally publishing its changelog
  * sidecar, so downstream [[CowStream]] MVs update in O(batch) too),
  * and the keyed variant runs the O(delta + touched buckets) COW merge
  * — table size never enters the per-batch cost.
  */
object CowSink {

  /** Micro-batch `b` commits data at id `2b+2` and (when scheduled)
    * compaction at `2b+3` — the even/odd split gives in-band
    * maintenance its own id after every batch without ever colliding
    * with a later batch's data commit, and keeps ids strictly
    * monotonic across batches. Ids are opaque to readers; only
    * monotonicity matters to the protocol.
    */
  private def idOf(batchId: Long, baseId: Long = 0L): Long =
    baseId + 2L * batchId + 2L
  private def compactIdOf(batchId: Long, baseId: Long = 0L): Long =
    baseId + 2L * batchId + 3L

  /** Loud guard for the silent-drop hazard: if the table's committed
    * frontier is ahead of this micro-batch's commit id by more than
    * the one in-band compaction slot, the table holds commits this
    * sink's checkpoint never made — a fresh checkpoint attached to an
    * existing table, or a foreign writer. Every such batch would
    * no-op on the replay guard and its data would be silently lost;
    * refuse instead. Attach to a pre-existing table with
    * `baseId >= current frontier`, or resume the original checkpoint.
    */
  private def guardFrontier(
      spark: org.apache.spark.sql.SparkSession,
      root: String, dataId: Long): Unit = {
    val frontier = CowTable.committedIds(spark, root).lastOption
      .getOrElse(0L)
    require(frontier <= dataId + 1,
      s"table frontier $frontier at $root is ahead of this micro-" +
        s"batch's commit id $dataId: the table has commits this " +
        "sink's checkpoint never made (fresh checkpoint on an " +
        "existing table, or a foreign writer) — the batch would be " +
        "silently dropped as a replay. Attach with baseId >= the " +
        "current frontier, or resume the original checkpoint.")
  }

  /** In-band small-file repair: streaming appends accrue one file per
    * partition per micro-batch — at one commit a minute that is 1,440
    * files per partition per day, the classic streaming small-files
    * problem. With `compactEvery = N`, every Nth micro-batch is
    * followed by a [[CowTable.compactPartitions]] commit at the odd
    * maintenance id: manifest-sized planning, rewrites only the
    * partitions whose file count exceeds what their bytes need, no-op
    * (id unconsumed) otherwise. Crash-replay safe like everything
    * else: a replayed batch's data commit no-ops on the frontier and
    * its compaction re-runs only if it never committed.
    */
  private[streaming] def maybeCompact(
      spark: org.apache.spark.sql.SparkSession,
      root: String, batchId: Long, compactEvery: Int,
      targetFileBytes: Long, keep: Int,
      changeLogKeys: Seq[String], baseId: Long): Unit =
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
      // thread the feed keys: a compaction is content-neutral, but on
      // a changelog-enabled table it must still publish its (empty)
      // sidecar — changeFeedFromLog serves a range only when EVERY
      // commit in it has one, so a keyless compaction would knock the
      // feed back to the O(table) snapshot diff at every interval
      CowTable.compactPartitions(spark, root,
        compactIdOf(batchId, baseId), targetFileBytes, keep,
        changeLogKeys)
      ()
    }

  /** One micro-batch appended as one table commit. Empty batches are
    * skipped (no empty commits; ids need not be contiguous — the
    * replay guard compares against the frontier, not a successor).
    */
  def appendBatch(
      batch: DataFrame,
      batchId: Long,
      root: String,
      partCols: Seq[String],
      changeLogKeys: Seq[String] = Nil,
      keep: Int = 2,
      baseId: Long = 0L): Unit =
    if (!batch.isEmpty) {
      val id = idOf(batchId, baseId)
      guardFrontier(batch.sparkSession, root, id)
      // changeLogRequired: the streaming feed has no snapshot-diff
      // fallback, so a batch that cannot carry its sidecar (key
      // overlap) must fail the micro-batch, not silently starve MVs
      CowTable.commitAppend(batch, root, id, partCols,
        keep = keep, changeLogKeys = changeLogKeys,
        changeLogRequired = changeLogKeys.nonEmpty)
    }

  /** One micro-batch REPLACING the whole table — Complete-mode output
    * (streaming aggregations emit their full result every trigger; the
    * table is the latest result). Same id discipline and replay guard
    * as [[appendBatch]]; empty batches still commit (an aggregation
    * whose result became empty must clear the table).
    */
  def replaceBatch(
      batch: DataFrame,
      batchId: Long,
      root: String,
      partCols: Seq[String],
      changeLogKeys: Seq[String] = Nil,
      keep: Int = 2,
      baseId: Long = 0L): Unit = {
    val id = idOf(batchId, baseId)
    guardFrontier(batch.sparkSession, root, id)
    CowTable.commitFull(batch, root, id, partCols, keep = keep,
      changeLogKeys = changeLogKeys)
    ()
  }

  /** One micro-batch upserted (newest-wins on `keyCols`) as one COW
    * merge commit — the streaming CDC-apply path.
    */
  def upsertBatch(
      batch: DataFrame,
      batchId: Long,
      root: String,
      keyCols: Seq[String],
      partCols: Seq[String],
      changeLog: Boolean = false,
      keep: Int = 2,
      baseId: Long = 0L): Unit =
    if (!batch.isEmpty) {
      val id = idOf(batchId, baseId)
      guardFrontier(batch.sparkSession, root, id)
      CowTable.upsert(batch.sparkSession, root, id, batch,
        keyCols, partCols, keep = keep, changeLog = changeLog)
    }

  /** Append-mode streaming writer: every micro-batch becomes one
    * append commit (insert-only ingest — event logs, sensor feeds).
    */
  def append(
      stream: DataFrame,
      root: String,
      partCols: Seq[String],
      checkpoint: String,
      changeLogKeys: Seq[String] = Nil,
      keep: Int = 2,
      compactEvery: Int = 0,
      targetFileBytes: Long = 128L * 1024 * 1024,
      baseId: Long = 0L,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) => {
          appendBatch(b, id, root, partCols, changeLogKeys, keep, baseId)
          maybeCompact(b.sparkSession, root, id, compactEvery,
            targetFileBytes, keep, changeLogKeys, baseId)
        })
    trigger.foreach(writer.trigger)
    writer.start()
  }

  /** Keyed streaming writer: every micro-batch COW-merges into the
    * table (streaming upsert — CDC tail, mutable-entity feeds). The
    * usual [[CowTable.upsert]] contract applies: `partCols` must be a
    * pure function of `keyCols`.
    */
  def upsert(
      stream: DataFrame,
      root: String,
      keyCols: Seq[String],
      partCols: Seq[String],
      checkpoint: String,
      changeLog: Boolean = false,
      keep: Int = 2,
      compactEvery: Int = 0,
      targetFileBytes: Long = 128L * 1024 * 1024,
      baseId: Long = 0L,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) => {
          upsertBatch(b, id, root, keyCols, partCols, changeLog, keep,
            baseId)
          maybeCompact(b.sparkSession, root, id, compactEvery,
            targetFileBytes, keep, if (changeLog) keyCols else Nil,
            baseId)
        })
    trigger.foreach(writer.trigger)
    writer.start()
  }
}
