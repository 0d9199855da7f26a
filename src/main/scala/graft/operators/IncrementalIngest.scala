package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (watermark-bookmarked) batch extraction — the feature the
  * reference's metadata reserves but never wires up
  * (`watermark_col_name_1`/`latest_watermark_val_1`, reference:
  * commons/utilities.py:162; SURVEY §1.1: these are batch bookmarks, not
  * streaming watermarks).
  *
  * `selectNew` filters rows past the bookmark — the predicate lands in
  * PushedFilters so a sorted/partitioned source skips old data entirely.
  * `nextWatermark` computes the new bookmark in the same pass. At 100 TB
  * the source should be partitioned by (a prefix of) the watermark
  * column so old partitions prune instead of scan-and-drop.
  */
object IncrementalIngest {

  final case class Result(fresh: DataFrame, nextWatermark: Option[String])

  /** @param source     full source table
    * @param watermark  monotonically-nondecreasing bookmark column
    * @param lastValue  previous bookmark (None → first run, full load)
    */
  def selectNew(
      source: DataFrame,
      watermark: String,
      lastValue: Option[String]): DataFrame =
    lastValue.fold(source)(v => source.where(col(watermark) > lit(v)))

  /** One incremental pull: new rows + the advanced bookmark (max over
    * the fresh slice; unchanged when no new rows).
    */
  def pull(
      source: DataFrame,
      watermark: String,
      lastValue: Option[String]): Result = {
    // Pin the slice before taking the bookmark: without the cache the
    // max-aggregate and the caller's later write are two separate scans
    // — rows arriving in between would be written now AND re-read next
    // batch (bookmark below their watermark). Caller unpersists
    // `fresh` after writing.
    val fresh = selectNew(source, watermark, lastValue).cache()
    val next = fresh.agg(max(col(watermark)).cast("string")).head().getString(0)
    Result(fresh, Option(next).orElse(lastValue))
  }
}
