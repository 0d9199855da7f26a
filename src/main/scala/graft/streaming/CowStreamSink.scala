package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

import graft.sinks.CowTable

/** `df.writeStream.format("cow")` — the table format as a REGISTERED
  * streaming sink, so ingesting into a cow table needs no graft import
  * at all:
  *
  * {{{
  * events.writeStream.format("cow")
  *   .option("checkpointLocation", ckpt)
  *   .option("partitionBy", "day")             // optional
  *   .option("changeLogKeys", "event_id")      // optional: feed MVs
  *   .start("/data/events")                    // path form…
  *
  * cdc.writeStream.format("cow")
  *   .option("checkpointLocation", ckpt)
  *   .option("table", "cow.raw.customers")     // …or the NAMED form
  *   .option("keys", "c_custkey")              // upsert, newest-wins
  *   .start()
  * }}}
  *
  * ARCHITECTURE NOTE — why the V1 `Sink` seam and not a DSv2
  * `StreamingWrite`: the V2 streaming write hands executor-side
  * `InternalRow` writers the job of producing data files, which would
  * force this engine to duplicate its commit pipeline (stats
  * collection, changelog sidecars, CHECK-constraint scans, bucket
  * tagging) outside the DataFrame writers that already implement it.
  * The V1 `addBatch(batchId, DataFrame)` seam hands the whole
  * micro-batch back on the driver as a frame, so every micro-batch
  * rides the SAME [[CowSink]] paths (`appendBatch` / `upsertBatch` /
  * `replaceBatch`) as the programmatic API — Delta's `DeltaSink` made
  * the identical choice for the identical reason. Exactly-once falls
  * out of the table's own replay guard: ids derive from the
  * checkpoint's micro-batch id, and a replayed batch no-ops at the
  * committed frontier.
  *
  * OUTPUT MODES: Append → one append commit per micro-batch (or a COW
  * merge when `keys` is set); Complete → the batch REPLACES the table
  * (streaming aggregation results). Update is refused — a cow table
  * has no key-context to interpret bare changed-rows against unless
  * `keys` is given, in which case Update behaves as the upsert it
  * means.
  *
  * OPTIONS: `table` (named form, `[cat.]ns.t` over a registered
  * CowCatalog) or the `start(path)` path; `partitionBy`, `keys`,
  * `changeLogKeys` (comma-separated); `keep`, `compactEvery`,
  * `targetFileBytes`, `baseId` (numbers). With `compactEvery = N`,
  * every Nth micro-batch is followed by the in-band small-file
  * compaction commit ([[CowSink.maybeCompact]]).
  */
final class CowStreamSink(
    root: String,
    partCols: Seq[String],
    keyCols: Seq[String],
    changeLogKeys: Seq[String],
    keep: Int,
    compactEvery: Int,
    targetFileBytes: Long,
    baseId: Long,
    mode: OutputMode) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // single-shot IncrementalExecution → multi-action stable frame,
    // exactly as Spark's own ForeachBatchSink re-wraps before user code
    val batch = org.apache.spark.sql.graftbridge.Bridge.stableBatch(data)
    val spark = batch.sparkSession
    if (mode == OutputMode.Complete())
      CowSink.replaceBatch(batch, batchId, root, partCols,
        changeLogKeys, keep, baseId)
    else if (keyCols.nonEmpty) {
      // the upsert path's changelog is keyed by the MERGE keys — a
      // different requested feed key would be silently ignored, and a
      // downstream MV folding on it would net rows wrong
      require(changeLogKeys.isEmpty || changeLogKeys == keyCols,
        s"the keyed sink publishes its change feed keyed by keys " +
          s"($keyCols); changeLogKeys ($changeLogKeys) cannot differ — " +
          "drop the option or make them equal")
      CowSink.upsertBatch(batch, batchId, root, keyCols, partCols,
        changeLog = changeLogKeys.nonEmpty, keep, baseId)
    }
    else
      CowSink.appendBatch(batch, batchId, root, partCols,
        changeLogKeys, keep, baseId)
    CowSink.maybeCompact(spark, root, batchId, compactEvery,
      targetFileBytes, keep, changeLogKeys, baseId)
  }

  override def toString: String = s"CowStreamSink[$root]"
}

object CowStreamSink {

  /** Build the sink from `writeStream` options (see class scaladoc). */
  def fromParameters(spark: SparkSession,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      mode: OutputMode): CowStreamSink = {
    require(mode == OutputMode.Append() || mode == OutputMode.Complete()
        || (mode == OutputMode.Update() &&
          parameters.get("keys").exists(_.nonEmpty)),
      s"cow streaming sink supports Append and Complete output (and " +
        s"Update with option(\"keys\", …) as an upsert), got $mode")
    // Complete REPLACES the whole table each micro-batch — a keys
    // option would be silently ignored (no upsert, no changeLogKeys
    // consistency check), so a user who meant an upsert must hear it
    require(!(mode == OutputMode.Complete() &&
        parameters.get("keys").exists(_.nonEmpty)),
      "cow streaming sink: option(\"keys\", …) has no effect under " +
        "Complete output (every micro-batch replaces the table) — " +
        "drop the option, or use Update/Append mode for a keyed upsert")
    val root = resolveRoot(spark, parameters)
    def csv(k: String): Seq[String] = parameters.get(k).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val parts =
      if (partitionColumns.nonEmpty) partitionColumns else csv("partitionBy")
    new CowStreamSink(root, parts, csv("keys"), csv("changeLogKeys"),
      parameters.get("keep").map(_.toInt).getOrElse(2),
      parameters.get("compactEvery").map(_.toInt).getOrElse(0),
      parameters.get("targetFileBytes").map(_.toLong)
        .getOrElse(128L * 1024 * 1024),
      // baseId MUST be stable across restarts of the same checkpoint —
      // deriving it from the current frontier would re-commit a
      // crash-replayed micro-batch under a fresh id (silent duplicate).
      // Default 0; attaching a FRESH checkpoint to a pre-existing table
      // requires an explicit baseId >= the frontier (the frontier guard
      // refuses loudly otherwise)
      parameters.get("baseId").map(_.toLong).getOrElse(0L),
      mode)
  }

  /** `start(path)` → the path; `option("table", "[cat.]ns.t")` → the
    * registered CowCatalog's `warehouse/ns/t`.
    */
  private def resolveRoot(spark: SparkSession,
      parameters: Map[String, String]): String =
    parameters.get("path") match {
      case Some(p) => p
      case None =>
        val t = parameters.getOrElse("table",
          throw new IllegalArgumentException(
            "cow streaming sink needs a target: .start(root) or " +
              ".option(\"table\", \"[cat.]ns.t\")"))
        val parts = t.split("\\.").toSeq
        val (cat, ns, name) = parts match {
          case Seq(c, n, tb) => (c, n, tb)
          case Seq(n, tb) =>
            // name-form resolution picks a WAREHOUSE — with several
            // cow catalogs registered the choice must never fall to
            // conf-map iteration order (data landing in whichever
            // warehouse wins is a silent wrong-table write)
            val cats = CowStream.registeredCowCatalogs(spark)
            val cat =
              if (cats.contains("cow")) "cow"
              else if (cats.size == 1) cats.head
              else if (cats.isEmpty) throw new IllegalArgumentException(
                s"no CowCatalog registered in this session to resolve " +
                  s"table $t — register spark.sql.catalog.<name> or " +
                  "use the 3-part cat.ns.t form")
              else throw new IllegalArgumentException(
                s"ambiguous table $t: several cow catalogs are " +
                  s"registered ($cats) — use the 3-part cat.ns.t form")
            (cat, n, tb)
          case _ => throw new IllegalArgumentException(
            s"cow streaming sink table must be [cat.]ns.t, got $t")
        }
        val cls = classOf[graft.catalog.CowCatalog].getName
        require(spark.conf.getOption(s"spark.sql.catalog.$cat")
            .contains(cls),
          s"$cat is not a registered cow catalog (spark.sql.catalog.$cat)")
        val wh = spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
          .getOrElse(throw new IllegalArgumentException(
            s"catalog $cat has no spark.sql.catalog.$cat.warehouse"))
        s"$wh/$ns/$name"
    }
}
