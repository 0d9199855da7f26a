package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing / sharding for training-data pipelines: assign each
  * document to a shard so shards hold ~`shardWeight` of payload (tokens,
  * bytes) in a deterministic global order.
  *
  * The core is a GLOBAL prefix sum — the textbook way
  * (`Window.orderBy(id)` with no partition key) funnels the entire
  * corpus through ONE task, the same single-partition hazard the
  * reference's W1 window carries. This implementation is the two-phase
  * shape that scales:
  *
  *  1. range-bucket the orderly id axis (`bucket = id div bucketSize`)
  *     and window-cumsum WITHIN each bucket — parallel across buckets;
  *  2. aggregate one row per bucket, window-cumsum those (tiny: corpus
  *     size / bucketSize rows — for 10^12 docs and bucketSize 10^6,
  *     10^6 rows), broadcast-join the bucket offsets back.
  *
  * `cum(id) = bucket_offset + local_cum` is then exactly the global
  * running total, each document's shard is a pure expression over it,
  * and no stage saw more than a bucket's rows in one task. Same
  * decomposition as `KeyMapUpsert.scalable` numbering; `keymap_scalable`
  * proves the invariants under oracle, `pack_shards` proves the values.
  */
object Pack {

  /** (idCol, weightCol, …) → same rows + `cum` (inclusive global running
    * sum of weight in ascending id order) + `shard` (greedy packing:
    * shard k holds the docs whose EXCLUSIVE prefix weight lies in
    * [k·shardWeight, (k+1)·shardWeight)). Ids must be unique; weights
    * non-negative longs.
    */
  def packGreedy(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      shardWeight: Long,
      bucketSize: Long = 1000L): DataFrame = {
    require(shardWeight > 0, "shardWeight must be positive")
    require(bucketSize > 0, "bucketSize must be positive")
    val id = col(idCol)
    val w = col(weightCol)
    val bucket = floorDiv(id, bucketSize).as("__bucket")

    val bucketed = docs.withColumn("__bucket", bucket)
    // phase 1: parallel within-bucket running sums
    val wLocal = Window.partitionBy(col("__bucket"))
      .orderBy(id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__local_cum", sum(w).over(wLocal))

    // phase 2: one row per bucket → cumsum over buckets (tiny) →
    // exclusive offsets broadcast back
    val wBuckets = Window.orderBy(col("__bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed
      .groupBy(col("__bucket"))
      .agg(sum(w).as("__bw"))
      .withColumn("__offset",
        sum(col("__bw")).over(wBuckets) - col("__bw"))
      .select(col("__bucket").as("__ob"), col("__offset"))

    local
      .join(broadcast(offsets), col("__bucket") === col("__ob"))
      .withColumn("cum", col("__offset") + col("__local_cum"))
      .withColumn("shard", floorDiv(col("cum") - w, shardWeight))
      .drop("__bucket", "__local_cum", "__ob", "__offset")
  }

  private def floorDiv(c: Column, d: Long): Column = IntMath.floorDiv(c, d)
}
