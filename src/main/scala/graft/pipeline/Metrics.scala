package graft.pipeline

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

/** One completed action's physical execution profile. */
final case class ActionMetrics(
    action: String,
    durationMs: Long,
    outputRows: Long,
    filesRead: Long,
    bytesRead: Long,
    shuffleBytesWritten: Long,
    spillBytes: Long,
    error: String)

/** Physical-metrics observability — the engine-level completion of the
  * reference's operational log (commons/utilities.py:320-356 records
  * job status + row counts into MySQL; [[DagRunner]] reproduces that
  * layer). Row counts say WHETHER a job ran; these metrics say WHAT IT
  * COST: files and bytes actually scanned (is pruning working?),
  * shuffle bytes written (is the job shuffle-bound?), spill (are
  * partitions sized to memory?). At 100 TB this is the difference
  * between noticing a full-table scan the day the bill arrives and
  * the run it first happens — a pruning regression shows up here as a
  * bytesRead step-change long before wall-clock degrades enough to
  * page anyone.
  *
  * Usage: `Metrics.register(spark)` once; every action (count/collect/
  * write) appends an [[ActionMetrics]]; [[MetricsListener.drain]]
  * after a task and ship the rows to any audit [[graft.sinks.Sink]]
  * (the same stores `DagRunner` writes).
  *
  * Listener dispatch is ASYNC (Spark's listener bus), so drain after
  * actions complete, not mid-flight; `drainWhen` polls for that.
  */
final class MetricsListener extends QueryExecutionListener {

  // each record keeps a WEAK reference to the QueryExecution it came
  // from (identity only, never dereferenced) so callers can attribute
  // an action's metrics to THEIR query on a shared, concurrently-used
  // session — min/max heuristics over a shared bus latch other
  // workloads' actions. Weak because a listener lives as long as the
  // session: a strong reference would pin every action's full plan
  // tree in the buffer and grow the heap without bound
  private val buf =
    new ConcurrentLinkedQueue[(java.lang.ref.WeakReference[AnyRef], ActionMetrics)]()

  // AQE wraps (and nests) the real plan: AdaptiveSparkPlanExec at the
  // root, and LEAF QueryStageExec wrappers (Result/Shuffle/Broadcast
  // stages) whose materialized plan hides in `.plan` — without
  // unwrapping those, traversal stops at the first stage boundary and
  // every metric reads empty
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      unwrap(s.plan)
    case other => other
  }

  /** Sum over the plan, taking per NODE the FIRST name in `names` that
    * carries a positive value: a scan node may expose both "filesSize"
    * and "bytesRead" for the same I/O (varies by Spark version and
    * datasource), and summing both would double-count that node —
    * `names` is a preference order, not a set.
    */
  private def sumMetric(root: SparkPlan, names: Seq[String]): Long = {
    var total = 0L
    def visit(p: SparkPlan): Unit = p match {
      // a reused exchange points BACK at an already-visited subtree
      // (the shared-exchange shape Merge/Cdc deliberately produce) —
      // descending into it would double-count that stage's scan and
      // shuffle bytes, turning "plan gained exchange reuse" into a
      // phantom bytesRead step-change
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        ()
      case _ =>
        val q = unwrap(p)
        names.iterator
          .flatMap(n => q.metrics.get(n))
          .find(_.value > 0)
          .foreach(m => total += m.value)
        q.children.foreach(visit)
    }
    visit(root)
    total
  }

  /** First node in BFS order carrying `name` — the result rows of the
    * whole action (the true root is often a metric-less AQE/result
    * stage wrapper).
    */
  private def topMetric(root: SparkPlan, name: String): Long = {
    val queue = scala.collection.mutable.Queue(root)
    while (queue.nonEmpty) {
      val q = unwrap(queue.dequeue())
      q.metrics.get(name) match {
        case Some(m) => return m.value
        case None => queue.enqueueAll(q.children)
      }
    }
    -1L
  }

  override def onSuccess(
      funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution,
      durationNs: Long): Unit = {
    val plan = unwrap(qe.executedPlan)
    buf.add(new java.lang.ref.WeakReference[AnyRef](qe) -> ActionMetrics(
      action = funcName,
      durationMs = durationNs / 1000000L,
      outputRows = topMetric(plan, "numOutputRows"),
      filesRead = sumMetric(plan, Seq("numFiles")),
      bytesRead = sumMetric(plan, Seq("filesSize", "bytesRead")),
      shuffleBytesWritten = sumMetric(plan, Seq("shuffleBytesWritten")),
      spillBytes = sumMetric(plan, Seq("spillSize")),
      error = ""))
  }

  override def onFailure(
      funcName: String,
      qe: org.apache.spark.sql.execution.QueryExecution,
      exception: Exception): Unit =
    buf.add(new java.lang.ref.WeakReference[AnyRef](qe) -> ActionMetrics(funcName, -1L, -1L, -1L, -1L, -1L, -1L,
      graft.meta.JobRun.sanitize(Option(exception.getMessage).getOrElse(""))))

  /** Remove and return everything recorded so far. */
  def drain(): Seq[ActionMetrics] = drainAll().map(_._2)

  private def drainAll(): Seq[(java.lang.ref.WeakReference[AnyRef], ActionMetrics)] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(java.lang.ref.WeakReference[AnyRef], ActionMetrics)]
    var m = buf.poll()
    while (m != null) { out += m; m = buf.poll() }
    out.toSeq
  }

  /** Poll (listener dispatch is async) until `pred` holds over the
    * pending metrics or the timeout lapses; then drain.
    */
  def drainWhen(
      pred: Seq[ActionMetrics] => Boolean,
      timeoutMs: Long = 10000): Seq[ActionMetrics] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline &&
      !pred(buf.toArray(
        Array.empty[(java.lang.ref.WeakReference[AnyRef], ActionMetrics)])
        .toSeq.map(_._2))) {
      Thread.sleep(50)
    }
    drain()
  }

  /** Poll until an action for EXACTLY this QueryExecution (a
    * `df.queryExecution` reference — actions pass their Dataset's own
    * instance to the listener) lands, then drain and return only that
    * execution's metrics. This is the attribution-safe way to assert
    * on one query's I/O while other suites share the session.
    */
  def drainFor(
      qe: AnyRef, timeoutMs: Long = 10000): Seq[ActionMetrics] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (System.nanoTime() < deadline &&
      !buf.toArray(
        Array.empty[(java.lang.ref.WeakReference[AnyRef], ActionMetrics)])
        .exists(_._1.get eq qe)) {
      Thread.sleep(50)
    }
    drainAll().filter(_._1.get eq qe).map(_._2)
  }
}

object Metrics {
  /** Register a fresh listener on the session and return it. */
  def register(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }

  /** Metrics rows as a frame, ready for any audit [[graft.sinks.Sink]]. */
  def toDf(spark: SparkSession, ms: Seq[ActionMetrics]): DataFrame = {
    import spark.implicits._
    ms.toDF()
  }
}
