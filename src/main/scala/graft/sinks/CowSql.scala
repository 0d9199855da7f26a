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
  * Table references are `` cow.`<table root path>` `` or the NAMED
  * catalog form `cow.<ns>.<table>` (resolved under the registered
  * catalog's warehouse, the same root [[graft.catalog.CowCatalog]]
  * serves to the analyzer — e.g.
  * `UPDATE cow.curated.orders SET … WHERE …`). MERGE requires the
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
  // matched BEFORE parsePlan, Delta's surface syntax. A table
  // reference is cow.`<root path>` (group 1) or the NAMED catalog
  // form cow.<ns>.<table> (groups 2+3, resolved under the registered
  // catalog's warehouse).
  private val Ref = """cow\.(?:`([^`]+)`|(\w+)\.(\w+))"""
  private val OptimizeRe =
    s"""(?is)\\s*OPTIMIZE\\s+$Ref\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)\\s*""".r
  private val VacuumRe =
    s"""(?is)\\s*VACUUM\\s+$Ref\\s+RETAIN\\s+(\\d+)\\s+SNAPSHOTS\\s*""".r
  private val VacuumHoursRe =
    s"""(?is)\\s*VACUUM\\s+$Ref\\s+RETAIN\\s+(\\d+)\\s+HOURS\\s*""".r
  private val RestoreRe =
    s"""(?is)\\s*RESTORE\\s+$Ref\\s+TO\\s+SNAPSHOT\\s+(\\d+)\\s*""".r

  /** The warehouse dir of the registered `cow` catalog — named
    * references resolve against it exactly as [[graft.catalog
    * .CowCatalog.rootOf]] does (`warehouse/<ns>/<table>`), so textual
    * DML and the analyzer-resolved surface address the same root.
    */
  private def warehouseOf(spark: SparkSession): String = {
    val w = spark.conf.getOption("spark.sql.catalog.cow.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        "a named cow.<ns>.<table> reference needs the cow catalog " +
          "registered (spark.sql.catalog.cow.warehouse)"))
    require(w.nonEmpty, "spark.sql.catalog.cow.warehouse is empty")
    w
  }

  private def refRoot(spark: SparkSession, path: String, ns: String,
      table: String): String =
    if (path != null) path else s"${warehouseOf(spark)}/$ns/$table"

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
    case OptimizeRe(p, ns, t, cols) =>
      CowTable.optimizeZorder(spark, refRoot(spark, p, ns, t), id,
        cols.split(",").toSeq.map(_.trim.stripPrefix("`")
          .stripSuffix("`")).filter(_.nonEmpty), keep = keep)
    case VacuumRe(p, ns, t, n) =>
      CowTable.vacuum(spark, refRoot(spark, p, ns, t), keep = n.toInt)
    case VacuumHoursRe(p, ns, t, h) =>
      CowTable.vacuumOlderThan(spark, refRoot(spark, p, ns, t),
        h.toLong * 3600000L)
    case RestoreRe(p, ns, t, toId) =>
      CowTable.restore(spark, refRoot(spark, p, ns, t), toId.toLong,
        keep = keep)
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
        val root = rootOf(spark, table)
        if (useMor(spark, root, mode, thresholdBytes))
          CowTable.deleteWhereDv(spark, root, id, expr(cond.sql),
            keep = keep)
        else
          CowTable.deleteWhere(spark, root, id, expr(cond.sql),
            keep = keep)
      case UpdateTable(table, assignments, cond) =>
        val root = rootOf(spark, table)
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

  /** The CowTable root of a table reference (possibly under the
    * statement's alias): `` cow.`/path` `` addresses the root
    * directly; the NAMED form `cow.<ns>.<table>` resolves under the
    * registered catalog's warehouse — one statement surface over both
    * addressing styles.
    */
  private def rootOf(spark: SparkSession, plan: LogicalPlan): String =
    plan match {
      case SubqueryAlias(_, child) => rootOf(spark, child)
      case r: UnresolvedRelation
          if r.multipartIdentifier.head.equalsIgnoreCase("cow") =>
        r.multipartIdentifier match {
          case Seq(_, path) if path.startsWith("/") => path
          case Seq(_, ns, table) => s"${warehouseOf(spark)}/$ns/$table"
          case parts => throw new IllegalArgumentException(
            "cow references are cow.`<absolute path>` or " +
              s"cow.<ns>.<table>, got ${parts.mkString(".")}")
        }
      case other => throw new IllegalArgumentException(
        "table reference must be cow.`<table root path>` or " +
          s"cow.<ns>.<table>, got ${other.getClass.getSimpleName}")
    }

  private def aliasOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  private def execMerge(
      spark: SparkSession, id: Long, m: MergeIntoTable,
      keep: Int): Unit = {
    val root = rootOf(spark, m.targetTable)
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
