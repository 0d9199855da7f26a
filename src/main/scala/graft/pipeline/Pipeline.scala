package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.meta.JobRun

/** In-engine DAG sequencing + run auditing — the analog of the
  * reference's Airflow/Composer task chains and `operational_metadata`
  * audit log (reference: composer/goSalesPipeline.py:23-29,106-108
  * sequential task chain; commons/utilities.py:320-356 audit insert).
  *
  * Tasks run sequentially (the reference's chaining is strictly
  * sequential); each task's row count and status land in a `JobRun`
  * record appended to the audit store. A failed task halts the chain —
  * the analog of Airflow marking downstream tasks upstream_failed.
  */
final case class Task(
    name: String,
    layer: String, // RAW | CURATED | SEMANTIC
    tableId: Long = 999L)(val body: SparkSession => Long)

/** @param auditSinks additional audit stores the run records are
  *   appended to after the parquet log — e.g. a
  *   [[graft.sinks.JdbcSink]] pointing at the monitoring database,
  *   matching the reference's operational-metadata MySQL insert
  *   (reference: commons/utilities.py:320-327).
  */
final class DagRunner(
    spark: SparkSession,
    batchId: String,
    auditPath: String,
    auditSinks: Seq[graft.sinks.Sink] = Nil) {

  /** Runs tasks in order; returns audit records (also appended to the
    * parquet audit log). Halts at the first failure.
    */
  def run(tasks: Seq[Task]): Seq[JobRun] = {
    val runs = scala.collection.mutable.ArrayBuffer.empty[JobRun]
    var failed = false
    tasks.foreach { t =>
      if (!failed) {
        val start = System.currentTimeMillis()
        val rec =
          try {
            val rows = t.body(spark)
            mkRun(t, start, rows, "Success", "")
          } catch {
            case e: Throwable =>
              failed = true
              mkRun(t, start, 0L, "Failure", JobRun.sanitize(e.getMessage))
          }
        runs += rec
      }
    }
    writeAudit(runs.toSeq)
    runs.toSeq
  }

  private def mkRun(
      t: Task, startMs: Long, rows: Long,
      status: String, err: String): JobRun = {
    val end = System.currentTimeMillis()
    JobRun(
      batchId = batchId, tableId = t.tableId,
      dbName = "graft", schemaName = t.layer.toLowerCase, tblName = t.name,
      layer = t.layer, rowsIngested = rows,
      jobStartTime = new Timestamp(startMs), jobEndTime = new Timestamp(end),
      jobExecutionTime = (end - startMs) / 1000.0,
      jobStatus = status, exception = err, remarks = "",
      srcExtractionType = "full", rawIngestionType = "parquet",
      jobName = s"${t.layer.toLowerCase}_${t.name}")
  }

  private def writeAudit(runs: Seq[JobRun]): Unit = {
    import spark.implicits._
    if (runs.nonEmpty) {
      val df = runs.toDF().coalesce(1)
      df.write.mode("append").parquet(auditPath)
      // secondary stores are best-effort: a flaky monitoring DB must not
      // turn a successful batch into a failure (the parquet log above is
      // the source of truth, and it is already written) — but it fails
      // LOUD in the logs rather than silently dropping records
      auditSinks.foreach { s =>
        try s.write(df)
        catch {
          case e: Exception => System.err.println(
            s"[DagRunner] audit sink $s failed (parquet log intact): " +
              JobRun.sanitize(String.valueOf(e.getMessage)))
        }
      }
    }
  }
}

object DagRunner {
  def apply(
      spark: SparkSession,
      batchId: String,
      auditPath: String,
      auditSinks: Seq[graft.sinks.Sink] = Nil): DagRunner =
    new DagRunner(spark, batchId, auditPath, auditSinks)
}
