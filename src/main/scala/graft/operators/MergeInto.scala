package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One WHEN clause of a multi-clause MERGE ([[MergeInto.apply]]).
  * Conditions and SET/VALUES expressions are SQL strings over the two
  * row aliases `t` (target) and `s` (source) — `"s.qty > t.qty"`,
  * `Map("qty" -> "t.qty + s.qty")` — resolved against the joined row's
  * struct columns, so they stay ordinary Catalyst expressions
  * (codegen'd, no UDF).
  */
sealed trait MergeClause { def condition: Option[String] }

/** WHEN MATCHED [AND cond] THEN UPDATE SET col = expr, … — columns not
  * in `set` keep the target's value.
  */
final case class MatchedUpdate(
    set: Map[String, String],
    condition: Option[String] = None) extends MergeClause

/** WHEN MATCHED [AND cond] THEN DELETE. */
final case class MatchedDelete(
    condition: Option[String] = None) extends MergeClause

/** WHEN NOT MATCHED [AND cond] THEN INSERT — `values` maps target
  * columns to expressions; an EMPTY map is `INSERT *` by name (source
  * columns matching the target schema; target-only columns NULL).
  */
final case class NotMatchedInsert(
    values: Map[String, String] = Map.empty,
    condition: Option[String] = None) extends MergeClause

/** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET … — the
  * Delta/SQL:2023 extension: a target row with no source match.
  */
final case class NotMatchedBySourceUpdate(
    set: Map[String, String],
    condition: Option[String] = None) extends MergeClause

/** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE. */
final case class NotMatchedBySourceDelete(
    condition: Option[String] = None) extends MergeClause

/** Multi-clause ANSI MERGE INTO as one full-outer join + one codegen'd
  * CASE chain — the general form of the reference's single-shape merge
  * jobs (jobs/curated/dl_cr_job.py's upsert is the special case
  * `MatchedUpdate(all) :: NotMatchedInsert() :: Nil`).
  *
  * Semantics follow SQL MERGE:
  *  - clauses are evaluated IN ORDER within their group (matched /
  *    not-matched / not-matched-by-source); the first whose condition
  *    holds applies; no clause applying leaves the row as-is (matched /
  *    by-source groups) or drops it (not-matched group);
  *  - a NULL merge key never matches (plain equality join);
  *  - more than one source row matching one target row is an error
  *    (ANSI's cardinality violation), enforced with one delta-sized
  *    aggregate when `enforceUniqueSource` (on by default);
  *  - the output keeps the target's schema exactly — every SET/VALUES
  *    expression is cast to the target column's type.
  *
  * Scale shape: ONE shuffle of each side on the merge keys (the join),
  * the CASE chain rides the join's output inside whole-stage codegen,
  * and without not-matched-by-source clauses the join can be restricted
  * to source-keyed partitions by the caller (the CowTable.upsert
  * pattern). The cardinality check is an aggregate over the SOURCE only
  * — delta-sized, never the table.
  */
object MergeInto {

  def apply(
      target: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      clauses: Seq[MergeClause],
      enforceUniqueSource: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "MERGE needs at least one merge key")
    require(clauses.nonEmpty, "MERGE needs at least one WHEN clause")
    val outCols = target.columns.toSeq
    val srcCols = source.columns.toSeq
    keyCols.foreach(k => require(srcCols.contains(k),
      s"source must carry merge key '$k'"))
    val outType = target.schema

    if (enforceUniqueSource) {
      // ANSI's cardinality violation is about a TARGET row matched by
      // more than one source row — duplicate NOT-MATCHED source keys
      // are legal (they all insert), so the duplicate keys are
      // semi-joined against the target's keys before refusing. Cost:
      // the (tiny) duplicate-key set probes the target once.
      val dupKeys = source
        .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
        .select(keyCols.map(col): _*)
      val offending = dupKeys
        .join(target.select(keyCols.map(col): _*), keyCols, "left_semi")
        .limit(1).count()
      require(offending == 0,
        s"MERGE cardinality violation: a target row matches more than " +
          s"one source row on ${keyCols.mkString(", ")} — collapse the " +
          "source per key (duplicate keys that match NO target row " +
          "would have been legal inserts)")
    }

    val t = target.select(struct(outCols.map(col): _*).as("t"))
    val s = source.select(struct(srcCols.map(col): _*).as("s"))
    val joinCond = keyCols
      .map(k => col("t").getField(k) === col("s").getField(k))
      .reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    def typed(c: String, e: String): Column =
      expr(e).cast(outType(c).dataType).as(c)
    val keepT = struct(outCols.map(c => col(s"t.$c").as(c)): _*)
    val dropRow = lit(null).cast(outType)
    def updated(set: Map[String, String]): Column = {
      set.keys.foreach(c => require(outCols.contains(c),
        s"SET references non-target column '$c'"))
      struct(outCols.map(c =>
        set.get(c).map(typed(c, _)).getOrElse(col(s"t.$c").as(c))): _*)
    }
    def inserted(values: Map[String, String]): Column = {
      values.keys.foreach(c => require(outCols.contains(c),
        s"INSERT references non-target column '$c'"))
      if (values.nonEmpty)
        struct(outCols.map(c => values.get(c).map(typed(c, _))
          .getOrElse(lit(null).cast(outType(c).dataType).as(c))): _*)
      else // INSERT * by name
        struct(outCols.map(c =>
          if (srcCols.contains(c))
            col(s"s.$c").cast(outType(c).dataType).as(c)
          else lit(null).cast(outType(c).dataType).as(c)): _*)
    }
    def chain(
        cs: Seq[MergeClause], result: MergeClause => Column,
        fallthrough: Column): Column =
      cs.foldRight(fallthrough) { (cl, rest) =>
        cl.condition.map(c => when(expr(c), result(cl)).otherwise(rest))
          .getOrElse(result(cl))
      }

    val matchedCs = clauses.collect {
      case c: MatchedUpdate => c: MergeClause
      case c: MatchedDelete => c: MergeClause
    }
    val notMatchedCs = clauses.collect { case c: NotMatchedInsert => c }
    val bySourceCs = clauses.collect {
      case c: NotMatchedBySourceUpdate => c: MergeClause
      case c: NotMatchedBySourceDelete => c: MergeClause
    }
    def resultOf(c: MergeClause): Column = c match {
      case MatchedUpdate(set, _) => updated(set)
      case MatchedDelete(_) => dropRow
      case NotMatchedInsert(values, _) => inserted(values)
      case NotMatchedBySourceUpdate(set, _) => updated(set)
      case NotMatchedBySourceDelete(_) => dropRow
    }

    val matched = col("t").isNotNull && col("s").isNotNull
    val sourceOnly = col("t").isNull
    val rowResult =
      when(matched, chain(matchedCs, resultOf, keepT))
        .when(sourceOnly,
          chain(notMatchedCs.map(c => c: MergeClause), resultOf, dropRow))
        .otherwise(chain(bySourceCs, resultOf, keepT))

    joined.select(rowResult.as("__r"))
      .where(col("__r").isNotNull)
      .select(outCols.map(c => col(s"__r.$c").as(c)): _*)
  }
}
