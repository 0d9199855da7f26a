package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** String/key normalization (SURVEY §2.2 R3/R7/R8). All pure Column
  * expressions — whole-stage-codegen friendly, no UDFs.
  */
object Normalize {

  /** Trim every StringType column (reference: jobs/raw/dl_rw_job.py:98 —
    * `.strip()` over all values). Python strip removes all leading and
    * trailing whitespace incl. \r\n\t, so use a regex trim, not `trim`
    * (which strips spaces only).
    */
  def trimAll(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType)
        regexp_replace(col(f.name), "^\\s+|\\s+$", "").as(f.name)
      else col(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Case-insensitive join-key normalization (reference:
    * .../dl_ct_gosales_sales_fact_01.py:68-71 — `lower()` on every key).
    * Normalize at comparison, never at write (SURVEY §7.5.4).
    */
  def lowerKey(c: Column): Column = lower(c)

  /** Fuzzy key normalization: LOWER(REPLACE(TRIM(x),' ','')) (reference:
    * jobs/curated/helpings/tehsil_hlp/punjabcencus_tehsil_hlp_01.sql:14).
    */
  def fuzzyKey(c: Column): Column =
    lower(regexp_replace(trim(c), " ", ""))

  /** Collapse internal whitespace runs to single spaces + trim — the
    * cleanup a text pipeline wants before tokenization.
    */
  def collapseWhitespace(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\s+", " "), "^ | $", "")
}
