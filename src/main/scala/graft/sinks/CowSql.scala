package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertStarAction,
  LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction,
  UpdateTable}
import org.apache.spark.sql.functions.expr

import graft.operators.{MatchedDelete, MatchedUpdate, MergeClause,
  NotMatchedBySourceDelete, NotMatchedBySourceUpdate, NotMatchedInsert}

/** Textual DML over [[CowTable]] paths through SPARK'S OWN PARSER —
  * `spark.sessionState.sqlParser` already produces the full ANSI
  * `UPDATE` / `DELETE FROM` / `MERGE INTO` ASTs (it only lacks an
  * executor for v1 relations); this object interprets those plans onto
  * the CowTable commit API, so a user who lives in SQL strings (the
  * reference's SQL-file runner style — utilities.py's executor over
  * the jobs/semantic SQL files) gets the table format's DML with no
  * DataFrame code:
  *
  * {{{
  * CowSql.exec(spark, id = 7,
  *   "DELETE FROM cow.`/data/events` WHERE ts < DATE'2020-01-01'")
  * CowSql.exec(spark, id = 8,
  *   "UPDATE cow.`/data/events` SET flag = 'x' WHERE user_id = 42")
  * CowSql.exec(spark, id = 9, """
  *   MERGE INTO cow.`/data/dim` AS t USING updates AS s
  *   ON t.k = s.k
  *   WHEN MATCHED AND s.ver > t.ver THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *""")
  * }}}
  *
  * Table references use `cow.`<table root path>``. MERGE requires the
  * aliases `t` (target) and `s` (source) — the same row aliases
  * [[graft.operators.MergeInto]]'s clause expressions are written
  * against — and a named table/view as the source; merge keys are the
  * ON clause's `t.k = s.k` conjuncts, and the table's own manifest
  * supplies the partition columns. Everything else (conditions,
  * assignments) round-trips as expression TEXT (`Expression.sql`), so
  * the statements execute as ordinary codegen'd Catalyst expressions.
  */
object CowSql {

  // maintenance statements Spark's parser has no grammar for —
  // matched BEFORE parsePlan, Delta's surface syntax
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+cow\.`([^`]+)`\s+ZORDER\s+BY\s*\(([^)]+)\)\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+cow\.`([^`]+)`\s+RETAIN\s+(\d+)\s+SNAPSHOTS\s*""".r
  private val VacuumHoursRe =
    """(?is)\s*VACUUM\s+cow\.`([^`]+)`\s+RETAIN\s+(\d+)\s+HOURS\s*""".r
  private val RestoreRe =
    """(?is)\s*RESTORE\s+cow\.`([^`]+)`\s+TO\s+SNAPSHOT\s+(\d+)\s*""".r

  /** How a textual UPDATE / DELETE lands on the table:
    *
    *  - [[Cow]] — copy-on-write: rewrite the matched partitions
    *    ([[CowTable.deleteWhere]]/[[CowTable.updateWhere]]); steady
    *    state stays debt-free. The default, and the right call for
    *    deletes that empty most of what they touch.
    *  - [[Mor]] — merge-on-read: a DELETE writes positional deletion
    *    vectors ([[CowTable.deleteWhereDv]] — O(matched positions)
    *    bytes, scan-stage mask on read), an UPDATE masks the old
    *    images positionally and appends the new ones
    *    ([[CowTable.updateWhereDv]]). Zero partitions rewritten; the
    *    debt retires at the next COW rewrite or
    *    [[CowTable.foldTombstones]].
    *  - [[Auto]] — pick by the manifest's own numbers: MOR when the
    *    table's live data bytes exceed `morThresholdBytes`, COW below
    *    it. The match count is unknowable before the scan, but the
    *    REWRITE side scales with partition bytes the manifest already
    *    states — on a big table the rewrite is the certain cost, so
    *    the threshold is the honest proxy. (Both paths are
    *    property-proven result-identical in `PropertyDmlSpec`.)
    */
  sealed trait DmlMode
  case object Cow extends DmlMode
  case object Mor extends DmlMode
  case object Auto extends DmlMode

  /** Parse and execute one DML / maintenance statement as commit
    * `id` (VACUUM commits nothing and ignores it; RESTORE allocates
    * its own id by contract). `mode` routes UPDATE / DELETE between
    * the copy-on-write and merge-on-read economics (see [[DmlMode]]);
    * MERGE and the maintenance forms ignore it.
    */
  def exec(spark: SparkSession, id: Long, sql: String,
      keep: Int = 2, mode: DmlMode = Cow,
      morThresholdBytes: Long = 128L * 1024 * 1024): Unit = sql match {
    case OptimizeRe(root, cols) =>
      CowTable.optimizeZorder(spark, root, id,
        cols.split(",").toSeq.map(_.trim.stripPrefix("`")
          .stripSuffix("`")).filter(_.nonEmpty), keep = keep)
    case VacuumRe(root, n) =>
      CowTable.vacuum(spark, root, keep = n.toInt)
    case VacuumHoursRe(root, h) =>
      CowTable.vacuumOlderThan(spark, root, h.toLong * 3600000L)
    case RestoreRe(root, toId) =>
      CowTable.restore(spark, root, toId.toLong, keep = keep)
    case _ => execDml(spark, id, sql, keep, mode, morThresholdBytes)
  }

  private def useMor(spark: SparkSession, root: String,
      mode: DmlMode, thresholdBytes: Long): Boolean = mode match {
    case Cow => false
    case Mor => true
    case Auto => CowTable.currentManifest(spark, root)
      .exists(_.files.map(_.bytes).sum > thresholdBytes)
  }

  private def execDml(spark: SparkSession, id: Long, sql: String,
      keep: Int, mode: DmlMode, thresholdBytes: Long): Unit =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case DeleteFromTable(table, cond) =>
        val root = rootOf(table)
        if (useMor(spark, root, mode, thresholdBytes))
          CowTable.deleteWhereDv(spark, root, id, expr(cond.sql),
            keep = keep)
        else
          CowTable.deleteWhere(spark, root, id, expr(cond.sql),
            keep = keep)
      case UpdateTable(table, assignments, cond) =>
        val root = rootOf(table)
        val c = cond.map(x => expr(x.sql)).getOrElse(expr("true"))
        val sets = assignments.map(setOf).toMap
        if (useMor(spark, root, mode, thresholdBytes))
          CowTable.updateWhereDv(spark, root, id, c, sets, keep = keep)
        else
          CowTable.updateWhere(spark, root, id, c, sets, keep = keep)
      case m: MergeIntoTable =>
        execMerge(spark, id, m, keep)
      case other => throw new IllegalArgumentException(
        s"CowSql executes UPDATE / DELETE FROM / MERGE INTO; got " +
          s"${other.getClass.getSimpleName}")
    }

  private def setOf(a: Assignment): (String, org.apache.spark.sql.Column) =
    a.key match {
      case attr: UnresolvedAttribute =>
        // single-part target column; a qualified t.col normalizes too
        attr.nameParts.last -> expr(a.value.sql)
      case other => throw new IllegalArgumentException(
        s"SET target must be a column, got $other")
    }

  /** The CowTable root of a `cow`.`/path` reference (possibly under
    * the statement's alias).
    */
  private def rootOf(plan: LogicalPlan): String = plan match {
    case SubqueryAlias(_, child) => rootOf(child)
    case r: UnresolvedRelation if r.multipartIdentifier.size == 2 &&
        r.multipartIdentifier.head.equalsIgnoreCase("cow") =>
      r.multipartIdentifier(1)
    case other => throw new IllegalArgumentException(
      "table reference must be cow.`<table root path>`, got " +
        other.getClass.getSimpleName)
  }

  private def aliasOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  private def execMerge(
      spark: SparkSession, id: Long, m: MergeIntoTable,
      keep: Int): Unit = {
    val root = rootOf(m.targetTable)
    require(aliasOf(m.targetTable).contains("t"),
      "MERGE INTO cow.`…` AS t — the target alias must be `t` (the " +
        "clause expressions' row alias)")
    require(aliasOf(m.sourceTable).contains("s"),
      "USING <view> AS s — the source alias must be `s`")
    val source = m.sourceTable match {
      case SubqueryAlias(_, r: UnresolvedRelation) =>
        spark.table(r.multipartIdentifier.mkString("."))
      case other => throw new IllegalArgumentException(
        "MERGE source must be a named table or view (USING name AS s); " +
          s"got ${other.getClass.getSimpleName}")
    }
    // merge keys: the ON clause's `t.k = s.k` conjuncts
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val keys = conjuncts(m.mergeCondition).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last == b.nameParts.last &&
            Set(a.nameParts.head, b.nameParts.head) == Set("t", "s") =>
        a.nameParts.last
      case other => throw new IllegalArgumentException(
        s"ON clause must be a conjunction of t.k = s.k equalities; " +
          s"got ${other.sql}")
    }
    val tgtCols = CowTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    // UPDATE SET * assigns every NON-partition target column from the
    // source by name (partition columns may not be SET — mergeInto's
    // rule); a target column the source lacks is an ERROR, as in
    // Spark/Delta — silently leaving it stale would hide a misspelled
    // source column forever
    lazy val starSet: Map[String, String] = {
      val starCols = tgtCols.schema.fieldNames.toSeq
        .filterNot(tgtCols.partCols.contains)
      val missing = starCols.filterNot(source.columns.contains)
      require(missing.isEmpty,
        s"UPDATE SET *: source is missing target column(s) " +
          s"${missing.mkString(", ")}")
      starCols.map(c => c -> s"s.`$c`").toMap
    }
    def targetColOf(a: Assignment): String = a.key match {
      case attr: UnresolvedAttribute => attr.nameParts.last
      case other => throw new IllegalArgumentException(
        s"SET target must be a column, got $other")
    }
    def cond(e: Option[Expression]): Option[String] = e.map(_.sql)
    val matched: Seq[MergeClause] = m.matchedActions.map {
      case DeleteAction(c) => MatchedDelete(cond(c))
      case UpdateAction(c, assigns, _) => MatchedUpdate(
        assigns.map(a => targetColOf(a) -> a.value.sql).toMap, cond(c))
      case UpdateStarAction(c) => MatchedUpdate(starSet, cond(c))
      case other => throw new IllegalArgumentException(
        s"unsupported MATCHED action $other")
    }
    val notMatched: Seq[MergeClause] = m.notMatchedActions.map {
      case InsertAction(c, assigns) => NotMatchedInsert(
        assigns.map(a => targetColOf(a) -> a.value.sql).toMap, cond(c))
      case InsertStarAction(c) => NotMatchedInsert(Map.empty, cond(c))
      case other => throw new IllegalArgumentException(
        s"unsupported NOT MATCHED action $other")
    }
    val bySource: Seq[MergeClause] = m.notMatchedBySourceActions.map {
      case DeleteAction(c) => NotMatchedBySourceDelete(cond(c))
      case UpdateAction(c, assigns, _) => NotMatchedBySourceUpdate(
        assigns.map(a => targetColOf(a) -> a.value.sql).toMap, cond(c))
      case other => throw new IllegalArgumentException(
        s"unsupported NOT MATCHED BY SOURCE action $other")
    }
    CowTable.mergeInto(spark, root, id, source, keys,
      tgtCols.partCols, matched ++ notMatched ++ bySource, keep = keep)
  }
}
