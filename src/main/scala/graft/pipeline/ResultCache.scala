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
  *   - `optimizedPlan.canonicalized.toJSON` — Catalyst normalizes
  *     exprIds positionally and folds cosmetic differences, so two
  *     SYNTACTICALLY different but logically identical DataFrames
  *     (filter written before or after a select, reordered
  *     conjunctions) key to the same entry after optimization. JSON,
  *     not toString: the tree STRING elides expression lists past
  *     `spark.sql.debug.maxToStringFields` (default 25) as "... N more
  *     fields", so two wide plans differing only in the elided tail
  *     would key identically and serve each other's results — the
  *     exact wrong-results failure this class exists to refuse
  *     (spec-pinned with two 30-column selects differing in the tail);
  *   - every input file's (path, size, mtime), read from the plan's
  *     FileIndexes — a rewritten, appended or compacted source changes
  *     the inventory and MISSES, so staleness is structural, not
  *     TTL-guessed. Inventory listing is a driver metadata op of the
  *     same cost the scan's own planning pays.
  *
  * A hit reads the cached parquet and touches no source bytes
  * (spec-proved via MetricsListener and plan inspection). A miss
  * computes into a private staging dir and renames it into
  * `<root>/<key>/`; a concurrent miss that loses the rename discards
  * its staging copy and serves the winner's (both computed the same
  * content, and no writer can interleave inside another's directory).
  *
  * Scope, stated plainly: a plan with ANY non-file leaf — JDBC,
  * LocalRelation (whose data the canonicalized plan string omits),
  * views over temp data — or a non-deterministic expression is
  * REFUSED (fail-loud), not silently mis-cached.
  */
object ResultCache {

  /** Cache key of `df`'s current plan + input inventory. */
  def fingerprint(df: DataFrame): String = {
    val plan = df.queryExecution.optimizedPlan
    require(plan.deterministic,
      "refusing to cache a non-deterministic plan")
    // EVERY leaf must be a file-backed relation: a LocalRelation's data
    // is invisible in the canonicalized plan string, so letting one
    // through (even alongside file sources) would let two queries over
    // different local data share a key and serve each other's results
    val leaves = plan.collectLeaves()
    val relations = leaves.map {
      case lr: LogicalRelation => lr
      case other => throw new IllegalArgumentException(
        s"refusing to cache a non-file source: ${other.getClass.getName}")
    }
    require(relations.nonEmpty, "plan reads no file source — nothing to key on")
    val inventory = relations.flatMap { lr =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          // the FileIndex already holds cached statuses from the scan's
          // own planning — no per-file getFileStatus round-trips
          fs.location.listFiles(Nil, Nil).flatMap(_.files)
            .map(st =>
              s"${st.getPath}|${st.getLen}|${st.getModificationTime}")
            .sorted: Seq[String]
        case other => throw new IllegalArgumentException(
          s"refusing to cache a non-file source: ${other.getClass.getName}")
      }
    }
    val digest = MessageDigest.getInstance("SHA-256")
    digest.update(plan.canonicalized.toJSON.getBytes(StandardCharsets.UTF_8))
    inventory.foreach(l =>
      digest.update(l.getBytes(StandardCharsets.UTF_8)))
    digest.digest().map("%02x".format(_)).mkString
  }

  /** Serve `df` through the cache at `cacheRoot`: hit → read the
    * cached parquet; miss → compute into a private staging dir and
    * RENAME into place, so two concurrent misses of the same key can
    * never interleave inside one output directory (an in-place
    * mode-overwrite would let writer A's prepare delete writer B's
    * in-flight task files and then commit a mixed file set under
    * `_SUCCESS`). Rename losing the race just discards its staging
    * copy and serves the winner's — both computed the same content. */
  def through(df: DataFrame, cacheRoot: String): DataFrame = {
    val spark = df.sparkSession
    val dir = s"$cacheRoot/${fingerprint(df)}"
    if (!isCommitted(spark, dir)) {
      val staging = s"$dir.staging-${java.util.UUID.randomUUID()}"
      df.write.parquet(staging)
      val fs = new Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.rename(new Path(staging), new Path(dir)))
        fs.delete(new Path(staging), true) // lost the race; winner serves
    }
    spark.read.parquet(dir)
  }

  private def isCommitted(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
