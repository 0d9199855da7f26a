package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * rightTime <= leftTime within the same key group. Spark has no native
  * as-of join; the naive formulation (theta join on `r.ts <= l.ts` +
  * max-per-group) explodes quadratically.
  *
  * Distributed rebuild via the union-and-carry-forward pattern: tag both
  * sides, union, then one window pass per key ordered by (time, side)
  * carrying the last right payload forward. Exactly ONE shuffle on the
  * key — the same cost as a regular equi-join — and no pairwise blow-up.
  * This composition (SURVEY preference order (a)) beats a custom
  * SparkPlan because it inherits AQE, codegen, and spill handling for
  * free.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its `valueCols` get carried)
    * @param keyCol     equi-key column name present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param valueCols  right columns to attach (aliased as given)
    * @param strict     if true, require rightTime < leftTime (exclusive)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      strict: Boolean = false): DataFrame = {

    val leftCols = left.columns.toSeq
    // side ordinal: right rows sort BEFORE left rows at equal timestamps
    // unless strict (then right at equal ts must not match ⇒ sort after).
    val rightOrd = if (strict) 1 else 0
    val leftOrd = if (strict) 0 else 1

    // Right payloads travel inside ONE struct: `last(struct,
    // ignoreNulls)` then picks the latest right ROW — including rows
    // whose individual value columns are NULL. Carrying bare columns
    // with ignoreNulls would skip a matched-but-NULL value and leak a
    // stale older value (DuckDB ASOF / pandas merge_asof return NULL
    // there).
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftOrd))
      .select(
        Seq(col(keyCol).as("__k"), col("__t"), col("__side")) ++
          leftCols.map(c => col(c).as(s"__l_$c")) :+
          lit(null).cast(org.apache.spark.sql.types.StructType(
            valueCols.map(c => org.apache.spark.sql.types.StructField(
              c, right.schema(c).dataType)))).as("__r"): _*)

    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(rightOrd))
      .select(
        Seq(col(keyCol).as("__k"), col("__t"), col("__side")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
          struct(valueCols.map(c => col(c).as(c)): _*).as("__r"): _*)

    // deterministic tiebreak among right rows sharing (key, timestamp):
    // order ties by a content hash of the payload so reruns and
    // repartitionings carry the same row (left rows hash the null
    // struct to a constant)
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), xxhash64(col("__r")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))

    carried
      .where(col("__side") === leftOrd)
      .select(
        leftCols.map(c => col(s"__l_$c").as(c)) ++
          valueCols.map(c => col("__c")(c).as(c)): _*)
  }
}
