package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the co-located-join primitive for repeated
  * large-×-large joins (SURVEY §2.3 scale notes).
  *
  * At 100 TB a fact⋈fact join on a shared key shuffles BOTH sides every
  * run. Writing each side bucketed (hash-partitioned into a fixed
  * number of buckets, optionally sorted within buckets) moves that
  * shuffle to write time, ONCE: every later join on the bucket key
  * reads co-located buckets and sort-merge-joins with zero Exchange on
  * either side (asserted in `BucketedJoinSpec`). Rules for the layout
  * to pay off:
  *  - both sides bucketed on the SAME keys with the SAME bucket count
  *    (Spark only elides the shuffle when bucket specs line up);
  *  - bucket count sized so one bucket ≈ one task's worth of data at
  *    the target scale (100 TB / 4096 buckets ≈ 25 GB splits — pick
  *    thousands, not dozens);
  *  - `sortBy` the join key so the merge phase needs no per-task sort.
  *
  * Bucketing requires a catalog table (`saveAsTable`) — path-only
  * parquet has nowhere to record the bucket spec.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      numBuckets: Int,
      sortBy: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    // overwrite must also replace a STALE location: a managed table
    // written by a previous application isn't in this session's
    // in-memory catalog, so saveAsTable would treat the write as CREATE
    // and fail with LOCATION_ALREADY_EXISTS on the leftover directory
    if (mode == "overwrite") dropTableAndLocation(df.sparkSession, table)
    val w = df.write.mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    val sorted =
      if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Drop `table` (default database) from the catalog AND remove its
    * default managed location under the warehouse dir, whether or not
    * the current session's catalog knows the table.
    */
  def dropTableAndLocation(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
