package graft.pipeline

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Query-result cache keyed by the CANONICALIZED optimized plan plus
  * the exact input-file inventory — the warehouse results cache
  * (BigQuery/Snowflake serve repeated dashboards this way) for
  * file-backed tables.
  *
  * Key = sha256 of:
  *   - `optimizedPlan.canonicalized.toString` — Catalyst normalizes
  *     exprIds positionally and folds cosmetic differences, so two
  *     SYNTACTICALLY different but logically identical DataFrames
  *     (filter written before or after a select, reordered
  *     conjunctions) key to the same entry after optimization;
  *   - every input file's (path, size, mtime), read from the plan's
  *     FileIndexes — a rewritten, appended or compacted source changes
  *     the inventory and MISSES, so staleness is structural, not
  *     TTL-guessed. Inventory listing is a driver metadata op of the
  *     same cost the scan's own planning pays.
  *
  * A hit reads the cached parquet and touches no source bytes
  * (spec-proved via MetricsListener and plan inspection). A miss
  * computes, persists under `<root>/<key>/` (atomic via parquet's
  * `_SUCCESS`), and serves the just-written copy so hit and miss paths
  * return byte-identical frames. Concurrent misses of the same key
  * both write the same content — last overwrite wins, both correct.
  *
  * Scope, stated plainly: plans containing non-file sources (JDBC,
  * views over temp data) or non-deterministic expressions are REFUSED
  * (fail-loud), not silently mis-cached.
  */
object ResultCache {

  /** Cache key of `df`'s current plan + input inventory. */
  def fingerprint(df: DataFrame): String = {
    val plan = df.queryExecution.optimizedPlan
    require(plan.deterministic,
      "refusing to cache a non-deterministic plan")
    val relations = plan.collect { case lr: LogicalRelation => lr }
    require(relations.nonEmpty, "plan reads no file source — nothing to key on")
    val spark = df.sparkSession
    val hadoop = spark.sessionState.newHadoopConf()
    val inventory = relations.flatMap { lr =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.inputFiles.toSeq.sorted.map { p =>
            val path = new Path(p)
            val st = path.getFileSystem(hadoop).getFileStatus(path)
            s"$p|${st.getLen}|${st.getModificationTime}"
          }
        case other => throw new IllegalArgumentException(
          s"refusing to cache a non-file source: ${other.getClass.getName}")
      }
    }
    val digest = MessageDigest.getInstance("SHA-256")
    digest.update(plan.canonicalized.toString.getBytes(StandardCharsets.UTF_8))
    inventory.foreach(l =>
      digest.update(l.getBytes(StandardCharsets.UTF_8)))
    digest.digest().map("%02x".format(_)).mkString
  }

  /** Serve `df` through the cache at `cacheRoot`: hit → read the
    * cached parquet; miss → compute once, persist, serve the copy. */
  def through(df: DataFrame, cacheRoot: String): DataFrame = {
    val spark = df.sparkSession
    val dir = s"$cacheRoot/${fingerprint(df)}"
    if (!isCommitted(spark, dir)) df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def isCommitted(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
