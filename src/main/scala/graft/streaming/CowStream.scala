package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StringType

import graft.operators.{JoinMv, MaterializedAgg}
import graft.sinks.{CowTable, SnapshotTarget}

/** STREAMING CHANGE-FEED SOURCE over a [[CowTable]]'s write-time
  * changelog sidecars — the storage→streaming closure of the write-time
  * feed: every commit with `changeLogKeys` publishes a signed D/I
  * changelog under `_changes/<id>/`, and those directories are exactly
  * a file-stream source. A downstream materialized view then maintains
  * itself with O(batch) work per commit via [[MaterializedAgg]]'s ±1
  * retraction algebra and NEVER rescans the table — at 100 TB, a day of
  * commits costs the MV a day of deltas, not a table read. (The
  * reference's watermark-column incremental reads — utilities.py's
  * metadata-driven SELECTs — gesture at this loop; the sidecar stream
  * completes it with deletes and updates included.)
  *
  * TRANSPORT: `readStream.parquet(root/_changes/[0-9]*)`. Publishes are
  * atomic directory renames, and the `[0-9]*` glob skips `.tmp-*`
  * staging dirs, so the source only ever lists complete sidecars. Each
  * row carries its commit id (parsed from the file path) so the sink
  * can enforce commit semantics.
  *
  * COMMIT FRONTIER RULE (the publish→manifest race, [[mvBatch]]): a
  * sidecar is published instants BEFORE its manifest write, so the
  * stream can list one whose commit hasn't landed yet. A sidecar id is
  * servable iff it is COMMITTED; an uncommitted id with a LATER
  * committed id is dead forever (the replay guard forbids committing
  * behind the frontier) and its rows are dropped as the orphan they
  * are; an uncommitted id AT the frontier is waited for (bounded) —
  * timeout fails the micro-batch, which replays: the exactly-once-
  * preserving outcome.
  *
  * EXACTLY-ONCE: the MV target is a [[SnapshotTarget]] committed at
  * the micro-batch id — a crash-replayed batch whose snapshot already
  * committed is a no-op (same contract as [[StreamOps.upsertBatch]];
  * crash-replay spec-pinned in `CowStreamSpec`).
  *
  * RETENTION CONTRACT (operational): the writer's vacuum retention
  * (`keep`) must exceed the stream's worst-case lag in commits.
  * Sidecars age out with their manifests, and once an id's manifest is
  * vacuumed, `committedIds` no longer lists it — a lagging stream that
  * still holds that id's rows cannot tell committed-then-vacuumed from
  * never-committed. [[mvBatch]] detects this via the table's vacuum
  * high-water mark and FAILS the batch loudly (never guesses); the
  * recovery is an MV rebuild from a rescan, or a higher `keep`.
  * Similarly, if a WRITER crashed between sidecar publish and manifest
  * commit and then replays, it republishes `_changes/<id>` with fresh
  * file names; a stream that pinned the old paths in its checkpoint
  * fails on missing files — restart the MV stream from a fresh
  * checkpoint after the table recovers.
  */
object CowStream {

  /** The sidecar stream: table columns + `_oper` (D/I) + `_commit_id`
    * — served by the NAMED streaming source ([[CowFeedTable]], the
    * `.changes` nested metadata table) over the backticked path form,
    * so this helper and `spark.readStream.table("cow.<ns>.<t>.changes")`
    * are the same source: offsets are committed snapshot ids, the
    * publish→manifest race is structurally outside the feed (an
    * uncommitted sidecar is not yet in offset range), and a vacuumed
    * gap fails the batch loudly. The raw
    * `readStream.parquet(_changes/[0-9]*)` transport this replaces
    * could list mid-race sidecars and leaned on [[liveIds]]'s bounded
    * wait — that guard stays as defense in depth for replayed batches.
    * The schema is fixed at stream construction from the CURRENT
    * manifest; older sidecars written under a narrower (integer-chain)
    * schema upcast on read, a WIDENING commit mid-stream needs a
    * stream restart to pick up the new schema.
    */
  def changeFeed(spark: SparkSession, root: String): DataFrame = {
    CowTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed snapshot at $root — start the stream after the " +
          "initial commit"))
    // name resolution must not assume the session registered the
    // catalog as literally `cow` (initialize accepts any name, and a
    // bare-extensions session may have registered none): route through
    // whatever CowCatalog IS registered, auto-registering `cow` over a
    // scratch warehouse as the fallback — the backticked path form
    // never touches the warehouse, so the scratch dir stays empty
    val cat = registeredCowCatalog(spark).getOrElse {
      // never clobber a FOREIGN catalog that happens to be named cow —
      // overwriting its conf would re-route every later cow.ns.t
      // reference (and the CatalogManager's instance cache would keep
      // serving the foreign one here anyway)
      require(spark.conf.getOption("spark.sql.catalog.cow").isEmpty,
        "no CowCatalog is registered in this session and the name " +
          "'cow' is bound to a different catalog implementation — " +
          "register graft.catalog.CowCatalog under some catalog name " +
          "to stream a cow change feed")
      spark.conf.set("spark.sql.catalog.cow",
        classOf[graft.catalog.CowCatalog].getName)
      if (spark.conf.getOption("spark.sql.catalog.cow.warehouse").isEmpty)
        spark.conf.set("spark.sql.catalog.cow.warehouse",
          java.nio.file.Files.createTempDirectory("graft_cow_feed_wh")
            .toString)
      "cow"
    }
    spark.readStream.table(s"$cat.`$root`.changes")
  }

  /** Every catalog name this session registered a [[graft.catalog
    * .CowCatalog]] under, sorted for determinism.
    */
  private[graft] def registeredCowCatalogs(spark: SparkSession): Seq[String] = {
    val cls = classOf[graft.catalog.CowCatalog].getName
    spark.conf.getAll.collect {
      case (k, v) if k.startsWith("spark.sql.catalog.") && v == cls &&
          !k.stripPrefix("spark.sql.catalog.").contains(".") =>
        k.stripPrefix("spark.sql.catalog.")
    }.toSeq.sorted
  }

  /** The name of SOME registered [[graft.catalog.CowCatalog]] in this
    * session (preferring `cow` when several are), if any. Fine for
    * PATH-form resolution, where every cow catalog serves the same
    * root; name-form resolution must use [[registeredCowCatalogs]] and
    * refuse ambiguity instead.
    */
  private[graft] def registeredCowCatalog(spark: SparkSession): Option[String] = {
    val names = registeredCowCatalogs(spark)
    if (names.contains("cow")) Some("cow") else names.headOption
  }

  /** One micro-batch of the stream-maintained MV: frontier-filter the
    * batch (see scaladoc), fold the survivors' signed rows into a
    * retractable count/sum state, merge with the MV's current state,
    * commit at `batchId`. Exposed separately from [[mvSink]] so the
    * crash-replay contract is directly testable without a harness.
    */
  def mvBatch(
      batch: DataFrame,
      batchId: Long,
      tableRoot: String,
      mvPath: String,
      keys: Seq[String],
      values: Seq[String],
      waitMs: Long = 30000): Unit = {
    val spark = batch.sparkSession
    // replay guard: this micro-batch's MV snapshot already committed
    if (SnapshotTarget.committedIds(spark, mvPath).exists(_ >= batchId))
      return
    val live = liveIds(batch, tableRoot, waitMs)
    if (live.isEmpty) return // every id was a provable orphan — no-op
    val delta = MaterializedAgg.retractStateOf(
      batch.where(col("_commit_id").isin(live: _*)).drop("_commit_id"),
      keys, values, CowTable.ChangeOper)
    val merged = SnapshotTarget.read(spark, mvPath) match {
      case Some(cur) => MaterializedAgg.mergeRetract(keys, values, cur, delta)
      case None => delta.where(col("mv_n") =!= 0)
    }
    SnapshotTarget.commit(merged, mvPath, batchId)
  }

  /** The commit-frontier and retention guards shared by every sidecar
    * consumer ([[mvBatch]], [[joinMvBatch]]): of the batch's commit
    * ids, the ones that are COMMITTED — after waiting out the
    * publish→manifest race at the frontier (bounded; timeout fails the
    * batch so the stream replays) and failing LOUD when an unknown id
    * precedes the vacuum high-water mark (committed-then-vacuumed is
    * indistinguishable from never-committed — see the class scaladoc's
    * retention contract). Ids provably dead (behind a later committed
    * frontier) are dropped as orphans.
    */
  private def liveIds(
      batch: DataFrame, tableRoot: String, waitMs: Long): Seq[Long] = {
    val spark = batch.sparkSession
    val ids = batch.select(col("_commit_id")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (ids.isEmpty) return Nil
    var committed = CowTable.committedIds(spark, tableRoot).toSet
    def stillPending() = ids.filter(i =>
      !committed(i) && committed.forall(_ < i))
    val deadline = System.nanoTime() + waitMs * 1000000L
    while (stillPending().nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50)
      committed = CowTable.committedIds(spark, tableRoot).toSet
    }
    if (stillPending().nonEmpty)
      throw new IllegalStateException(
        s"sidecar ids ${stillPending()} at $tableRoot published but not " +
          s"committed after ${waitMs}ms — failing the micro-batch so the " +
          "stream replays it (a crashed writer's orphan resolves once a " +
          "later commit moves the frontier)")
    // RETENTION AMBIGUITY: an unknown id at or below the vacuum
    // high-water mark may have been committed and since vacuumed —
    // dropping it as an orphan would silently diverge the MV from the
    // table. committedIds only lists RETAINED manifests, so the
    // hwm marker is the only witness. Loud failure; the operator
    // rebuilds the MV or raises the writer's retention (`keep` must
    // exceed the stream's worst-case lag in commits).
    // INVISIBLE-COMMIT guard: a file-stream consumer only ever sees
    // ids that PUBLISHED a sidecar — a committed id at or below this
    // batch's frontier with no sidecar (a write path invoked without
    // changeLogKeys, an overlap-skipped pure-I append, a restore)
    // would be silently absent and the MV would diverge with no
    // failure at all. The check covers the feed's own range: from the
    // FIRST sidecar'd commit (history below it predates the feed — a
    // view over such a table is bootstrapped from a rescan, which is
    // the operator's contract, and those ids can never be re-wired
    // with sidecars anyway) up to this batch's frontier. A no-op
    // commit's sidecar is the EMPTY changelog, never a missing dir.
    val sidecarIds = committed.toSeq
      .filter(i => CowTable.hasChangeLog(spark, tableRoot, i))
    val feedFloor = sidecarIds.minOption.getOrElse(Long.MaxValue)
    val blind = committed.toSeq
      .filter(i => i > feedFloor && i <= ids.max &&
        !CowTable.hasChangeLog(spark, tableRoot, i)).sorted
    if (blind.nonEmpty)
      throw new IllegalStateException(
        s"committed ids $blind at $tableRoot published no changelog " +
          s"sidecar but precede this batch's frontier (${ids.max}) — a " +
          "sidecar-maintained view cannot see them and would silently " +
          "diverge. Re-commit writes with changeLogKeys (WAP stages " +
          "included) or rebuild the view from a table rescan")
    val hwm = CowTable.vacuumHwm(spark, tableRoot)
    val ambiguous = ids.filter(i => !committed(i) && hwm.exists(i <= _))
    if (ambiguous.nonEmpty)
      throw new IllegalStateException(
        s"sidecar ids $ambiguous at $tableRoot precede the vacuum " +
          s"high-water mark ($hwm): committed-then-vacuumed cannot be " +
          "told from never-committed. The stream lagged past the " +
          "writer's retention — rebuild the MV from a rescan, or raise " +
          "the writer's keep above the stream's worst-case commit lag")
    ids.filter(committed)
  }

  /** One micro-batch of a stream-maintained JOIN view: the table's
    * signed delta joined against a PINNED dimension snapshot via
    * [[JoinMv.applyDelta]] (weights ±1, grouped weight-sum merge), the
    * result committed at `batchId` — the streaming-enrichment MV
    * `A_current ⋈ B_snapshot` maintained with O(Δ ⋈ B) per commit and
    * zero fact-table rescans. Same frontier/retention/replay guards as
    * [[mvBatch]]. (A view over TWO independently-streaming tables needs
    * a cross-table commit order; pin one side — the dim — and restart
    * the stream to re-pin when it changes.)
    */
  def joinMvBatch(
      batch: DataFrame,
      batchId: Long,
      tableRoot: String,
      dim: DataFrame,
      joinKeys: Seq[String],
      mvPath: String,
      waitMs: Long = 30000): Unit = {
    val spark = batch.sparkSession
    if (SnapshotTarget.committedIds(spark, mvPath).exists(_ >= batchId))
      return
    val live = liveIds(batch, tableRoot, waitMs)
    if (live.isEmpty) return
    val delta = batch.where(col("_commit_id").isin(live: _*))
      .drop("_commit_id")
    val cur = SnapshotTarget.read(spark, mvPath).getOrElse(
      JoinMv.init(delta.drop(CowTable.ChangeOper).limit(0), dim, joinKeys))
    val merged = JoinMv.applyDelta(cur, delta, dim, joinKeys,
      deltaIsLeft = true, operCol = CowTable.ChangeOper,
      verifySigned = false) // write-time sidecars are signed by construction
    SnapshotTarget.commit(merged, mvPath, batchId)
  }

  /** The stream-maintained JOIN-view sink: [[changeFeed]] →
    * [[joinMvBatch]] per micro-batch.
    */
  def joinMvSink(
      spark: SparkSession,
      tableRoot: String,
      dim: DataFrame,
      joinKeys: Seq[String],
      mvPath: String,
      checkpoint: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    val writer = changeFeed(spark, tableRoot).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) => joinMvBatch(b, id, tableRoot, dim, joinKeys, mvPath))
    trigger.foreach(writer.trigger)
    writer.start()
  }

  /** The stream-maintained MV sink: [[changeFeed]] → [[mvBatch]] per
    * micro-batch. Run with `Trigger.AvailableNow` for catch-up-and-stop
    * or the default for continuous maintenance.
    */
  def mvSink(
      spark: SparkSession,
      tableRoot: String,
      mvPath: String,
      keys: Seq[String],
      values: Seq[String],
      checkpoint: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    val writer = changeFeed(spark, tableRoot).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) => mvBatch(b, id, tableRoot, mvPath, keys, values))
    trigger.foreach(writer.trigger)
    writer.start()
  }

  // -------------------------------------------------------------------
  // Join view over TWO independently-streaming tables
  // -------------------------------------------------------------------

  /** Commit NOTIFICATIONS from one table's sidecar feed: (side, id)
    * pairs only, schema-uniform so two tables' feeds union into one
    * stream. [[joinMv2Batch]] re-reads each commit's COMPLETE sidecar
    * from `_changes/<id>` — a file stream may split one commit's files
    * across micro-batches, and a HALF-applied commit joined against
    * the other side's full snapshot would double-count join partners;
    * the rows notify, the directory carries the atomic truth.
    */
  def changeFeedIds(
      spark: SparkSession, root: String, side: String): DataFrame =
    changeFeed(spark, root)
      .select(lit(side).as("_side"), col("_commit_id"))

  /** The table state AS OF applied frontier `id`. Frontier -1 is the
    * "nothing applied yet" sentinel and serves the honest EMPTY table
    * (-1, not 0: the commit API permits a FIRST commit with id 0, and
    * a 0 sentinel would serve commit-0 state while the `> floor`
    * delta filter never applies commit 0's delta — double-counting or
    * asymmetrically including its rows). A frontier ≥ 0 must be
    * time-travel-servable — if retention vacuumed it, substituting
    * empty would silently drop every join partner of the other side's
    * deltas, so that case fails LOUD (same retention contract as the
    * sidecar hwm guard: raise the writer's `keep` above the stream's
    * worst-case lag, or rebuild).
    */
  private def stateAt(
      spark: SparkSession, root: String, id: Long): DataFrame =
    CowTable.readAt(spark, root, id).getOrElse {
      if (id >= 0L)
        throw new IllegalStateException(
          s"join-view frontier $id at $root is no longer servable " +
            "(vacuumed past retention) — raise the writer's keep above " +
            "the stream's worst-case commit lag, or rebuild the view")
      val m = CowTable.currentManifest(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot at $root"))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    }

  /** One micro-batch of a join view over TWO INDEPENDENTLY-STREAMING
    * tables — the cross-table commit order [[joinMvBatch]]'s pinned-dim
    * variant deliberately avoids, made exact with three ingredients:
    *
    *  1. A SERIALIZATION: within the batch, commits apply in (id,
    *     side) order; across batches, arrival order. Any interleaving
    *     that preserves each table's own id order is exact under
    *     [[JoinMv]]'s composition law — the sort only makes replays
    *     deterministic.
    *  2. ATOMIC COMMITS: each live id's sidecar is re-read WHOLE from
    *     `_changes/<id>` (see [[changeFeedIds]]).
    *  3. A PERSISTED FRONTIER (fa, fb): the highest applied commit per
    *     side, committed as its own snapshot target under the MV path
    *     AFTER the MV commit. Each ΔA applies against B AS OF fb via
    *     time travel — the state the view has actually absorbed, not
    *     whatever B's table head happens to be. On replay the
    *     pre-batch frontier is re-read at `batchId - 1`, so a crash
    *     between the MV commit and the frontier commit heals: the MV
    *     skip-guard fires and the frontier is re-derived and
    *     committed idempotently.
    *
    * Retention is STRUCTURALLY safe: each batch registers a vacuum
    * fence ([[CowTable.registerStreamFrontier]], name
    * [[fenceNameFor]]) for its pre-batch frontier under BOTH source
    * roots before any time travel, and advances it after the commit —
    * a writer-side vacuum retains everything at or above the lowest
    * registered fence, however aggressive its `keep`, so a lagging
    * view can no longer be wedged by retention (decommissioning a view
    * means unregistering its fences, or retention pins forever). The
    * old doc-only contract — keep must exceed worst-case lag — remains
    * the guard for UNREGISTERED consumers. Non-key column names must
    * be disjoint between the two tables ([[JoinMv]]'s schema rule).
    */
  /** The per-view vacuum-fence name under the SOURCE roots — derived
    * from the MV path so one view's fences move together and
    * [[CowTable.unregisterStreamFrontier]] can retire them when the
    * view is decommissioned.
    */
  def fenceNameFor(mvPath: String): String = {
    // collision-free in practice (128-bit SHA-256 prefix): two views
    // sharing a fence name would cross-link their retention pins and
    // let unregistering one strip the other's protection
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(mvPath.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "jmv2-" + d.take(16).map("%02x".format(_)).mkString
  }

  def joinMv2Batch(
      batch: DataFrame,
      batchId: Long,
      rootA: String,
      rootB: String,
      joinKeys: Seq[String],
      mvPath: String,
      waitMs: Long = 30000,
      keep: Int = 2): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fPath = s"$mvPath/_frontier"
    val (fa0, fb0) = SnapshotTarget.readAt(spark, fPath, batchId - 1)
      .map(_.select("fa", "fb").as[(Long, Long)].collect().head)
      .getOrElse((-1L, -1L)) // -1 = nothing applied (see stateAt)
    // VACUUM FENCE, registered for the PRE-batch frontier before any
    // time travel below: a writer-side vacuum racing this batch then
    // structurally cannot drop the manifests/sidecars the apply loop
    // is about to read — the retention contract in the class scaladoc,
    // enforced instead of documented. (-1 pins everything: a view that
    // has applied nothing still needs the whole feed.) Advanced after
    // the MV commit; a crash between leaves the OLD fence — vacuum
    // merely retains more until the replay advances it.
    val fence = fenceNameFor(mvPath)
    CowTable.registerStreamFrontier(spark, rootA, fence, fa0)
    CowTable.registerStreamFrontier(spark, rootB, fence, fb0)
    def liveOf(side: String, root: String, floor: Long): Seq[Long] = {
      val ids = batch.where(col("_side") === side).select("_commit_id")
      if (ids.isEmpty) Nil
      else liveIds(ids, root, waitMs).filter(_ > floor)
    }
    val liveA = liveOf("a", rootA, fa0)
    val liveB = liveOf("b", rootB, fb0)
    val fa1 = (fa0 +: liveA).max
    val fb1 = (fb0 +: liveB).max
    // replay after a crash between the two commits below: the MV
    // already holds this batch — re-derive and commit ONLY the frontier
    if (SnapshotTarget.committedIds(spark, mvPath).exists(_ >= batchId)) {
      if (!SnapshotTarget.committedIds(spark, fPath).exists(_ >= batchId))
        SnapshotTarget.commit(Seq((fa1, fb1)).toDF("fa", "fb"), fPath,
          batchId, keep = 4)
      CowTable.registerStreamFrontier(spark, rootA, fence, fa1)
      CowTable.registerStreamFrontier(spark, rootB, fence, fb1)
      return
    }
    if (liveA.isEmpty && liveB.isEmpty) return
    var (fa, fb) = (fa0, fb0)
    var cur = SnapshotTarget.read(spark, mvPath).getOrElse {
      val a0 = stateAt(spark, rootA, -1L).limit(0)
      val b0 = stateAt(spark, rootB, -1L).limit(0)
      JoinMv.init(a0, b0, joinKeys)
    }
    val ordered = (liveA.map(i => ("a", i)) ++ liveB.map(i => ("b", i)))
      .sortBy { case (side, i) => (i, side) }
    // opt-in batch-composition diagnostic (stderr): the r18 verdict's
    // cow_stream_join2 swing-band breakout needs per-run micro-batch /
    // commit counts to rule out batch-splitting as the variance source
    if (sys.env.contains("SPARK_GRAFT_STREAM_DIAG"))
      Console.err.println(s"joinMv2Batch batch=$batchId " +
        s"liveA=${liveA.mkString(",")} liveB=${liveB.mkString(",")} " +
        s"frontier=($fa0,$fb0)")
    // each step's contribution joins against the other side AS OF that
    // step's frontier (the serialization above), but the MERGE into the
    // view is an associative grouped weight-sum — so the whole batch
    // folds in with ONE aggregation (JoinMv.applyDeltas) instead of one
    // exchange per commit (r19: a k-commit micro-batch's plan carried k
    // nested aggregates for no semantic reason)
    val contribs = ordered.map { case (side, id) =>
      val root = if (side == "a") rootA else rootB
      val delta = CowTable.changeLogFor(spark, root, id).getOrElse(
        throw new IllegalStateException(
          s"committed id $id at $root has no complete sidecar — " +
            "the join view cannot apply it"))
      val other =
        if (side == "a") stateAt(spark, rootB, fb)
        else stateAt(spark, rootA, fa)
      val c = JoinMv.deltaContribution(delta, other, joinKeys,
        deltaIsLeft = side == "a",
        // sidecars are signed by construction (changelogSigned is the
        // only writer) — skip the per-commit verification job
        verifySigned = false)
      if (side == "a") fa = id else fb = id
      c
    }
    cur = JoinMv.applyDeltas(cur, contribs, joinKeys)
    SnapshotTarget.commit(cur, mvPath, batchId, keep)
    SnapshotTarget.commit(Seq((fa, fb)).toDF("fa", "fb"), fPath,
      batchId, keep = 4)
    // fence forward: everything at or above the NEW frontier stays
    // servable for the next batch's time travel
    CowTable.registerStreamFrontier(spark, rootA, fence, fa)
    CowTable.registerStreamFrontier(spark, rootB, fence, fb)
  }

  /** The two-table join-view sink: both tables' id feeds unioned into
    * ONE streaming query → [[joinMv2Batch]] per micro-batch.
    */
  def joinMv2Sink(
      spark: SparkSession,
      rootA: String,
      rootB: String,
      joinKeys: Seq[String],
      mvPath: String,
      checkpoint: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    val feed = changeFeedIds(spark, rootA, "a")
      .unionByName(changeFeedIds(spark, rootB, "b"))
    val writer = feed.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: Long) => joinMv2Batch(b, id, rootA, rootB, joinKeys, mvPath))
    trigger.foreach(writer.trigger)
    writer.start()
  }
}
