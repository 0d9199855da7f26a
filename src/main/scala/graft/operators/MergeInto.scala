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

  /** `boundConds`, when non-empty, aligns POSITIONALLY with `clauses`:
    * a `Some(f)` at index i REPLACES clause i's text condition with
    * `f(joined)` — a Column pre-bound against the flat joined frame
    * (target columns as `__t_<c>`, source as `__s_<c>`). This is the
    * carrier for subquery-bearing clause conditions, which cannot
    * round-trip as text (`Expression.sql` renders unparseable
    * pseudo-functions): the bound conditions are evaluated as boolean
    * columns in a PROJECT over the flat join (legal for scalar AND
    * predicate subqueries in Spark 4 — the optimizer rewrites them to
    * existence joins), then the ordinary CASE chain consumes the
    * booleans. With no bound conditions the construction is the
    * original struct join, byte-for-byte.
    *
    * `boundSets` (round-16) is the same carrier for SET/VALUES
    * assignment values: clause i's map assigns column c from
    * `f(joined)` INSTEAD of a text expression — scalar subqueries
    * (correlated included) in `UPDATE SET c = (SELECT …)` and
    * `INSERT … VALUES ((SELECT …))`. Each bound value evaluates only
    * on the clause's ROW CLASS (matched / not-matched / by-source —
    * the same split the bound guards use, and for the same reason: a
    * correlated scalar lookup that is multi-row only for a row outside
    * the clause's class must not abort the statement). Spark's own
    * scalar-subquery machinery enforces the at-most-one-row rule at
    * runtime for rows the value DOES evaluate on.
    */
  def apply(
      target: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      clauses: Seq[MergeClause],
      enforceUniqueSource: Boolean = true,
      boundConds: Seq[Option[DataFrame => Column]] = Nil,
      boundSets: Seq[Map[String, DataFrame => Column]] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "MERGE needs at least one merge key")
    require(clauses.nonEmpty, "MERGE needs at least one WHEN clause")
    require(boundConds.isEmpty || boundConds.length == clauses.length,
      "boundConds must align with clauses")
    require(boundSets.isEmpty || boundSets.length == clauses.length,
      "boundSets must align with clauses")
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

    val bound = if (boundConds.isEmpty)
      Seq.fill[Option[DataFrame => Column]](clauses.length)(None)
    else boundConds
    val bSets = if (boundSets.isEmpty)
      Seq.fill[Map[String, DataFrame => Column]](clauses.length)(Map.empty)
    else boundSets
    bSets.foreach(_.keys.foreach(c => require(outCols.contains(c),
      s"bound SET/VALUES references non-target column '$c'")))
    val joined =
      if (bound.forall(_.isEmpty) && bSets.forall(_.isEmpty)) {
        val t = target.select(struct(outCols.map(col): _*).as("t"))
        val s = source.select(struct(srcCols.map(col): _*).as("s"))
        val joinCond = keyCols
          .map(k => col("t").getField(k) === col("s").getField(k))
          .reduce(_ && _)
        t.join(s, joinCond, "full_outer")
      } else {
        // FLAT construction: prefixed columns give the bound
        // conditions real AttributeReferences to rebind onto (a
        // struct field is not an Attribute, and OuterReference — the
        // correlation carrier inside subquery plans — only wraps
        // named expressions); explicit presence flags stand in for
        // the struct-null test (a target row that is all-NULL in
        // every column is still a matched row)
        // flag names live OUTSIDE the __t_/__s_ prefix namespace: a
        // real column named "present" prefixes to __t_present, which
        // must not collide with the flag itself
        val t = target.select(outCols.map(c => col(c).as(s"__t_$c")) :+
          lit(true).as("__graft_tp__"): _*)
        val s = source.select(srcCols.map(c => col(c).as(s"__s_$c")) :+
          lit(true).as("__graft_sp__"): _*)
        val joinCond = keyCols
          .map(k => col(s"__t_$k") === col(s"__s_$k")).reduce(_ && _)
        val flat = t.join(s, joinCond, "full_outer")
        // ANSI evaluates a WHEN clause's guard only on its own row
        // class (matched / not-matched / by-source) — a guard's
        // correlated scalar subquery must never run on rows that
        // cannot take the clause (a lookup that is multi-row only for
        // such a row would abort the statement; the same hazard the
        // matched-only UPDATE SET split closes). Split the join by
        // row class, compute each bound guard only on its class, and
        // union — three passes over the delta-sized join, only when
        // subqueries ride in guards.
        val tp = coalesce(col("__graft_tp__"), lit(false))
        val sp = coalesce(col("__graft_sp__"), lit(false))
        def classOf(cl: MergeClause): Int = cl match {
          case _: MatchedUpdate | _: MatchedDelete => 0
          case _: NotMatchedInsert => 1
          case _ => 2
        }
        def branch(rows: DataFrame, cls: Int): DataFrame = {
          val withGuards = bound.zipWithIndex.foldLeft(rows) {
            case (df, (Some(f), i)) if classOf(clauses(i)) == cls =>
              df.withColumn(s"__bc_$i", f(df))
            case (df, (Some(_), i)) =>
              df.withColumn(s"__bc_$i", lit(false)) // out of class: unused
            case (df, (None, _)) => df
          }
          // bound SET/VALUES values: computed (and target-typed, so the
          // three class branches union cleanly) only on the clause's
          // own class; typed NULL elsewhere — unused by construction
          bSets.zipWithIndex.foldLeft(withGuards) { case (acc, (m, i)) =>
            m.foldLeft(acc) { case (df, (c, f)) =>
              val dt = target.schema(c).dataType
              if (classOf(clauses(i)) == cls)
                df.withColumn(s"__bv_${i}_$c", f(df).cast(dt))
              else df.withColumn(s"__bv_${i}_$c", lit(null).cast(dt))
            }
          }
        }
        val withBc = branch(flat.where(tp && sp), 0)
          .unionByName(branch(flat.where(!tp), 1))
          .unionByName(branch(flat.where(!sp), 2))
        withBc.select(
          when(col("__graft_tp__"),
            struct(outCols.map(c => col(s"__t_$c").as(c)): _*)).as("t") +:
          when(col("__graft_sp__"),
            struct(srcCols.map(c => col(s"__s_$c").as(c)): _*)).as("s") +:
          (bound.zipWithIndex.collect {
            case (Some(_), i) => col(s"__bc_$i")
          } ++ bSets.zipWithIndex.flatMap { case (m, i) =>
            m.keys.toSeq.sorted.map(c => col(s"__bv_${i}_$c"))
          }): _*)
      }

    def typed(c: String, e: String): Column =
      expr(e).cast(outType(c).dataType).as(c)
    val keepT = struct(outCols.map(c => col(s"t.$c").as(c)): _*)
    val dropRow = lit(null).cast(outType)
    // clause i's value for column c, when bound: the pre-computed
    // (already target-typed) `__bv_` column from the flat construction
    def boundVal(i: Int, c: String): Option[Column] =
      if (bSets(i).contains(c)) Some(col(s"__bv_${i}_$c").as(c)) else None
    def updated(set: Map[String, String], i: Int): Column = {
      set.keys.foreach(c => require(outCols.contains(c),
        s"SET references non-target column '$c'"))
      struct(outCols.map(c => boundVal(i, c)
        .orElse(set.get(c).map(typed(c, _)))
        .getOrElse(col(s"t.$c").as(c))): _*)
    }
    def inserted(values: Map[String, String], i: Int): Column = {
      values.keys.foreach(c => require(outCols.contains(c),
        s"INSERT references non-target column '$c'"))
      if (values.nonEmpty || bSets(i).nonEmpty)
        struct(outCols.map(c => boundVal(i, c)
          .orElse(values.get(c).map(typed(c, _)))
          .getOrElse(lit(null).cast(outType(c).dataType).as(c))): _*)
      else // INSERT * by name
        struct(outCols.map(c =>
          if (srcCols.contains(c))
            col(s"s.$c").cast(outType(c).dataType).as(c)
          else lit(null).cast(outType(c).dataType).as(c)): _*)
    }
    // a clause's effective condition: its bound boolean column when
    // one rides at its index, else its text condition
    def condOf(cl: MergeClause, i: Int): Option[Column] =
      bound(i).map(_ => col(s"__bc_$i")).orElse(cl.condition.map(expr))
    def chain(
        cs: Seq[(MergeClause, Int)], result: (MergeClause, Int) => Column,
        fallthrough: Column): Column =
      cs.foldRight(fallthrough) { case ((cl, i), rest) =>
        condOf(cl, i).map(c => when(c, result(cl, i)).otherwise(rest))
          .getOrElse(result(cl, i))
      }

    val indexed = clauses.zipWithIndex
    val matchedCs = indexed.collect {
      case (c: MatchedUpdate, i) => (c: MergeClause, i)
      case (c: MatchedDelete, i) => (c: MergeClause, i)
    }
    val notMatchedCs = indexed.collect {
      case (c: NotMatchedInsert, i) => (c: MergeClause, i)
    }
    val bySourceCs = indexed.collect {
      case (c: NotMatchedBySourceUpdate, i) => (c: MergeClause, i)
      case (c: NotMatchedBySourceDelete, i) => (c: MergeClause, i)
    }
    def resultOf(c: MergeClause, i: Int): Column = c match {
      case MatchedUpdate(set, _) => updated(set, i)
      case MatchedDelete(_) => dropRow
      case NotMatchedInsert(values, _) => inserted(values, i)
      case NotMatchedBySourceUpdate(set, _) => updated(set, i)
      case NotMatchedBySourceDelete(_) => dropRow
    }

    val matched = col("t").isNotNull && col("s").isNotNull
    val sourceOnly = col("t").isNull
    val rowResult =
      when(matched, chain(matchedCs, resultOf, keepT))
        .when(sourceOnly, chain(notMatchedCs, resultOf, dropRow))
        .otherwise(chain(bySourceCs, resultOf, keepT))

    joined.select(rowResult.as("__r"))
      .where(col("__r").isNotNull)
      .select(outCols.map(c => col(s"__r.$c").as(c)): _*)
  }
}
