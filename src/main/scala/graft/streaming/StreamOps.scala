package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators — the streaming ingest/aggregation
  * extension the reference reserved but never built (its metadata
  * carries incremental-extraction watermark columns, unexercised —
  * reference: commons/utilities.py:162; SURVEY §2.6, §7.2.7).
  *
  * All transforms are plan-only: they bind to either a batch DataFrame
  * or a readStream source unchanged — the same declarative plan serves
  * both, which is exactly how Spark wants incremental pipelines built.
  */
object StreamOps {

  /** Tumbling-window event counts with a lateness watermark. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      lateness: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1e6).cast("long")).as("sum_value_u"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("sum_value_u"))

  /** Gap-based sessionization via the native session_window — merges
    * events separated by < gap into one session per user.
    */
  def sessionAgg(
      events: DataFrame,
      tsCol: String = "ts",
      gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1e6).cast("long")).as("sum_value_u"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value_u"))

  /** Streaming exact dedup bounded by the watermark — state is evicted
    * once keys age past the delay, so memory stays bounded at scale.
    */
  def streamingDedup(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  // -------------------------------------------------------------------
  // Custom state: running per-user stats via mapGroupsWithState — the
  // KeyValueGroupedDataset escape hatch for semantics session_window
  // can't express.
  // -------------------------------------------------------------------
  final case class UserEvent(user_id: Long, value_u: Long)
  final case class UserStats(user_id: Long, n: Long, sum_value_u: Long)

  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0L))
          var n = prev.n
          var s = prev.sum_value_u
          it.foreach { e => n += 1; s += e.value_u }
          val next = UserStats(uid, n, s)
          state.update(next)
          next
      }
  }

  /** Stream-stream interval join: clicks enriched with the purchase that
    * follows within `horizon` — both sides watermarked so join state is
    * evicted once the interval can no longer match (bounded memory at
    * any throughput).
    */
  def clickToPurchaseJoin(
      clicks: DataFrame, // user_id, ts, click_value
      purchases: DataFrame, // user_id, ts, purchase_value
      lateness: String = "10 minutes",
      horizonSeconds: Long = 3600): DataFrame = {
    val c = clicks.withWatermark("ts", lateness).as("c")
    val p = purchases.withWatermark("ts", lateness).as("p")
    c.join(p,
      expr(
        s"""c.user_id = p.user_id AND
           |p.ts >= c.ts AND
           |p.ts <= c.ts + INTERVAL $horizonSeconds seconds""".stripMargin))
      .select(col("c.user_id").as("user_id"),
        col("c.ts").as("click_ts"), col("p.ts").as("purchase_ts"),
        col("c.click_value").as("click_value"),
        col("p.purchase_value").as("purchase_value"))
  }

  /** foreachBatch bridge: applies an arbitrary BATCH writer (e.g. a
    * key-map upsert or JDBC merge) to each micro-batch — the standard
    * escape hatch for sinks/logic Structured Streaming lacks natively.
    */
  def foreachBatchSink(
      df: DataFrame,
      checkpoint: String)(
      writeBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeBatch(batch, id))
      .outputMode(OutputMode.Append)
      .start()

  /** Streaming raw-layer ingest: file-source stream → trim → parquet
    * sink with checkpointed exactly-once progress (the readStream
    * version of the reference's raw job).
    */
  def rawIngestStream(
      spark: org.apache.spark.sql.SparkSession,
      inPath: String,
      schema: org.apache.spark.sql.types.StructType,
      outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.operators.Normalize.trimAll(
      spark.readStream.schema(schema).parquet(inPath))
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .start()
}
