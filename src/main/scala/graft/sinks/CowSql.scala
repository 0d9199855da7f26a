package graft.sinks

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.analysis.UnresolvedTable
import org.apache.spark.sql.catalyst.plans.logical.{
  AddCheckConstraint, Assignment, DeleteAction, DeleteFromTable,
  DropConstraint, InsertAction, InsertStarAction, LogicalPlan,
  MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction,
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

  /** MERGE clause row classes — which join side a clause may
    * reference. Spark's `MergeIntoTable` analysis enforces these
    * scope rules; the textual probe path analyzes against a t×s frame
    * that sees BOTH sides, so [[bindViaProbe]] re-imposes them
    * (ADVICE r16): matched clauses see both; NOT MATCHED (insert)
    * clauses may not reference the target; NOT MATCHED BY SOURCE
    * clauses may not reference the source.
    */
  private sealed trait ClauseClass
  private case object MatchedClause extends ClauseClass
  private case object InsertClause extends ClauseClass
  private case object BySourceClause extends ClauseClass

  // maintenance statements Spark's parser has no grammar for —
  // matched BEFORE parsePlan, Delta's surface syntax. A table
  // reference is <cat>.`<root path>` (groups 1+2) or the NAMED form
  // <cat>.<ns>.<table> (groups 1+3+4, resolved under the registered
  // catalog's warehouse). Whether a reference ROUTES here is decided
  // per session by [[routableRef]]: the named form only when
  // spark.sql.catalog.<cat> is a registered [[graft.catalog
  // .CowCatalog]] (a session database or temp view that merely
  // HAPPENS to be called "cow" keeps Spark's own semantics), the
  // path-backtick form also under the literal name `cow` (the
  // catalog-less direct-path addressing style).
  private val Ref = """(\w+)\.(?:`([^`]+)`|(\w+)\.(\w+))"""
  // optional `WHERE <partition predicate>` scopes both forms to the
  // matching partitions (Delta's `OPTIMIZE t WHERE …`): the predicate
  // parses through Spark's own expression grammar and resolves against
  // the manifest's partition VALUES (CowTable.partitionsMatching)
  private val OptimizeRe =
    s"""(?is)\\s*OPTIMIZE\\s+$Ref(?:\\s+WHERE\\s+(.+?))?\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)\\s*""".r
  // plain OPTIMIZE (no ZORDER): bin-packing compaction that also folds
  // outstanding tombstones and deletion vectors — Delta's bare
  // `OPTIMIZE t` surface over [[CowTable.compactPartitions]]
  private val OptimizePlainRe =
    s"""(?is)\\s*OPTIMIZE\\s+$Ref(?:\\s+WHERE\\s+(.+?))?\\s*""".r
  private val VacuumRe =
    s"""(?is)\\s*VACUUM\\s+$Ref\\s+RETAIN\\s+(\\d+)\\s+SNAPSHOTS\\s*""".r
  private val VacuumHoursRe =
    s"""(?is)\\s*VACUUM\\s+$Ref\\s+RETAIN\\s+(\\d+)\\s+HOURS\\s*""".r
  private val RestoreRe =
    s"""(?is)\\s*RESTORE\\s+$Ref\\s+TO\\s+SNAPSHOT\\s+(\\d+)\\s*""".r
  // Delta's SHALLOW CLONE surface: the target's first snapshot is a
  // manifest-reference copy of the source snapshot (zero data copies;
  // CowTable.shallowClone). Spark's grammar has no CLONE statement, so
  // this routes pre-parse like the other maintenance forms.
  private val CloneRe =
    (s"""(?is)\\s*CREATE\\s+TABLE\\s+$Ref\\s+SHALLOW\\s+CLONE\\s+""" +
      s"""$Ref(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*""").r
  // metadata QUERY statements (produce rows, not commits): Delta's
  // DESCRIBE HISTORY surface, and SHOW PARTITIONS answered from the
  // manifest alone (Spark's own SHOW PARTITIONS needs a partition-
  // management API; the manifest already IS the partition listing)
  private val DescribeHistoryRe =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Ref\\s*""".r
  private val DescribeDetailRe =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Ref\\s*""".r
  private val ShowPartitionsRe =
    s"""(?is)\\s*SHOW\\s+PARTITIONS\\s+$Ref\\s*""".r
  private val FsckRe =
    s"""(?is)\\s*FSCK\\s+$Ref\\s*""".r
  private val DescribeFilesRe =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+FILES\\s+$Ref\\s*""".r

  /** Is `name` a REGISTERED cow catalog in this session? Routing is
    * gated on this (round-13 ADVICE): a session database or temp view
    * literally named `cow` must keep Spark's own semantics, and a
    * CowCatalog registered under ANY name gets the full textual
    * surface.
    */
  private def isCowCatalog(spark: SparkSession, name: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$name")
      .contains(classOf[graft.catalog.CowCatalog].getName)

  /** Does a `(cat, path, ns, table)` reference route to the cow
    * executor in THIS session? Named form: only a registered cow
    * catalog. Path-backtick form: a registered cow catalog under that
    * name, or the literal `cow` (direct-path addressing needs no
    * catalog at all).
    */
  private def routableRef(spark: SparkSession, cat: String,
      path: String): Boolean =
    if (path != null)
      cat.equalsIgnoreCase("cow") || isCowCatalog(spark, cat)
    else isCowCatalog(spark, cat)

  /** `(cat, path, ns, table)` of a DESCRIBE HISTORY statement over a
    * ROUTABLE cow reference, if that is what `sql` is (resolve with
    * [[refRoot]] at run time — the warehouse is session state).
    */
  private[graft] def describeHistoryRef(spark: SparkSession,
      sql: String): Option[(String, String, String, String)] = sql match {
    case DescribeHistoryRe(c, p, ns, t) if routableRef(spark, c, p) =>
      Some((c, p, ns, t))
    case _ => None
  }

  /** Same for DESCRIBE DETAIL over a routable cow reference. */
  private[graft] def describeDetailRef(spark: SparkSession,
      sql: String): Option[(String, String, String, String)] = sql match {
    case DescribeDetailRe(c, p, ns, t) if routableRef(spark, c, p) =>
      Some((c, p, ns, t))
    case _ => None
  }

  /** Same for SHOW PARTITIONS over a routable cow reference. */
  private[graft] def showPartitionsRef(spark: SparkSession,
      sql: String): Option[(String, String, String, String)] = sql match {
    case ShowPartitionsRe(c, p, ns, t) if routableRef(spark, c, p) =>
      Some((c, p, ns, t))
    case _ => None
  }

  /** Same for `FSCK cow.<ref>` — the invariant check as a statement
    * (round-16 verdict #6), so operators run it without Scala.
    */
  private[graft] def fsckRef(spark: SparkSession,
      sql: String): Option[(String, String, String, String)] = sql match {
    case FsckRe(c, p, ns, t) if routableRef(spark, c, p) =>
      Some((c, p, ns, t))
    case _ => None
  }

  /** Same for `DESCRIBE FILES cow.<ref>` — the file-level metadata
    * table (Iceberg's `table$files`) as a statement.
    */
  private[graft] def describeFilesRef(spark: SparkSession,
      sql: String): Option[(String, String, String, String)] = sql match {
    case DescribeFilesRe(c, p, ns, t) if routableRef(spark, c, p) =>
      Some((c, p, ns, t))
    case _ => None
  }

  /** The warehouse dir of the registered cow catalog `cat` — named
    * references resolve against it exactly as [[graft.catalog
    * .CowCatalog.rootOf]] does (`warehouse/<ns>/<table>`), so textual
    * DML and the analyzer-resolved surface address the same root,
    * whatever name the catalog was registered under.
    */
  private def warehouseOf(spark: SparkSession, cat: String): String = {
    require(isCowCatalog(spark, cat),
      s"$cat is not a registered cow catalog (spark.sql.catalog.$cat)")
    val w = spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"a named $cat.<ns>.<table> reference needs the catalog's " +
          s"warehouse set (spark.sql.catalog.$cat.warehouse)"))
    require(w.nonEmpty, s"spark.sql.catalog.$cat.warehouse is empty")
    w
  }

  private[graft] def refRoot(spark: SparkSession, cat: String,
      path: String, ns: String, table: String): String =
    if (path != null) path else s"${warehouseOf(spark, cat)}/$ns/$table"

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
      morThresholdBytes: Long = 128L * 1024 * 1024): Boolean = sql match {
    // OPTIMIZE reports ownership like every DML, with the engine
    // itself distinguishing the benign no-op (empty / already-compact
    // table, id unconsumed ⇒ success) from the lost race (a concurrent
    // writer took `id` — the caller must not be told the table was
    // optimized when it wasn't). The old re-listing of committed ids
    // AFTER a false return was racy: a concurrent commit landing in
    // that window turned a benign no-op into a spurious race failure.
    case OptimizeRe(c, p, ns, t, w, cols) if routableRef(spark, c, p) =>
      val root = refRoot(spark, c, p, ns, t)
      CowTable.optimizeZorderStatus(spark, root, id,
        cols.split(",").toSeq.map(_.trim.stripPrefix("`")
          .stripSuffix("`")).filter(_.nonEmpty), keep = keep,
        where = parsedWhere(spark, w)) != MaintSuperseded
    case OptimizePlainRe(c, p, ns, t, w) if routableRef(spark, c, p) =>
      val root = refRoot(spark, c, p, ns, t)
      CowTable.compactPartitionsStatus(spark, root, id, keep = keep,
        where = parsedWhere(spark, w)) != MaintSuperseded
    case VacuumRe(c, p, ns, t, n) if routableRef(spark, c, p) =>
      // an EXPLICIT VACUUM statement is the operator's reclamation
      // intent: collapse any delta chain crossing the floor so RETAIN
      // n retains exactly n (post-commit auto-vacuums amortize instead)
      CowTable.vacuum(spark, refRoot(spark, c, p, ns, t), keep = n.toInt,
        collapse = true)
      true
    case VacuumHoursRe(c, p, ns, t, h) if routableRef(spark, c, p) =>
      CowTable.vacuumOlderThan(spark, refRoot(spark, c, p, ns, t),
        h.toLong * 3600000L, collapse = true)
      true
    case RestoreRe(c, p, ns, t, toId) if routableRef(spark, c, p) =>
      CowTable.restore(spark, refRoot(spark, c, p, ns, t), toId.toLong,
        keep = keep) // throws on race (its own lease + based-on check)
      true
    case CloneRe(tc, tp, tns, tt, sc, sp, sns, st, v)
        if routableRef(spark, tc, tp) && routableRef(spark, sc, sp) =>
      CowTable.shallowClone(spark,
        refRoot(spark, sc, sp, sns, st),
        refRoot(spark, tc, tp, tns, tt),
        Option(v).map(_.toLong))
      true
    case _ => execDml(spark, id, sql, keep, mode, morThresholdBytes)
  }

  /** Does this statement text carry one of the cow MAINTENANCE forms
    * (OPTIMIZE / VACUUM / RESTORE over a `cow.` reference)? Spark's
    * own grammar has none of them, so [[graft.plans.CowSqlParser]]
    * asks BEFORE delegating — a non-cow text falls through to the
    * stock parser's own error.
    */
  private[graft] def isMaintenance(spark: SparkSession,
      sql: String): Boolean = sql match {
    case OptimizeRe(c, p, _, _, _, _) => routableRef(spark, c, p)
    case OptimizePlainRe(c, p, _, _, _) => routableRef(spark, c, p)
    case VacuumRe(c, p, _, _, _) => routableRef(spark, c, p)
    case VacuumHoursRe(c, p, _, _, _) => routableRef(spark, c, p)
    case RestoreRe(c, p, _, _, _) => routableRef(spark, c, p)
    case CloneRe(tc, tp, _, _, sc, sp, _, _, _) =>
      routableRef(spark, tc, tp) && routableRef(spark, sc, sp)
    case _ => false
  }

  /** Is this parsed statement a DML whose TARGET is a cow reference
    * (`` cow.`/path` `` or `cow.<ns>.<table>`)? Matched on the raw
    * parse tree — resolution never runs, so a session without the cow
    * catalog still routes (and fails loudly at the warehouse lookup,
    * not with an analyzer "table not found").
    */
  /** What the PRE-PARSE route still owns once named DML resolves
    * through the analyzer (round-13): constraint DDL over any cow form
    * (Spark's own AddCheckConstraint resolution needs a session-catalog
    * V1 relation a cow table never carries), and DML whose target is
    * the catalog-less PATH form (nothing for the analyzer to resolve
    * it against). A NAMED DML target falls through to the analyzer —
    * [[graft.plans.CowCatalogRule]] converts the RESOLVED statement,
    * so a misspelled column fails analysis with Spark's own error.
    */
  private[graft] def parserRoutes(spark: SparkSession,
      plan: LogicalPlan): Boolean = plan match {
    case ac: AddCheckConstraint => leafRef(ac.child).exists(isCowRef(spark, _))
    case dc: DropConstraint => leafRef(dc.child).exists(isCowRef(spark, _))
    case DeleteFromTable(t, _) => isCowPathRef(spark, t)
    case UpdateTable(t, _, _) => isCowPathRef(spark, t)
    case m: MergeIntoTable => isCowPathRef(spark, m.targetTable)
    case _ => false
  }

  /** PATH-form cow target only (`` cow.`/abs/path` ``). */
  private def isCowPathRef(spark: SparkSession,
      plan: LogicalPlan): Boolean = plan match {
    case SubqueryAlias(_, child) => isCowPathRef(spark, child)
    case r: UnresolvedRelation => r.multipartIdentifier match {
      case Seq(cat, path) if path.startsWith("/") =>
        cat.equalsIgnoreCase("cow") || isCowCatalog(spark, cat)
      case _ => false
    }
    case _ => false
  }

  /** The statement target's leaf reference, under whatever the parser
    * wrapped it in (AddCheckConstraint carries a Filter validation
    * scan; DROP carries a bare UnresolvedTable).
    */
  private def leafRef(plan: LogicalPlan): Option[LogicalPlan] =
    plan.collectFirst {
      case r: UnresolvedRelation => r
      case t: UnresolvedTable => t
    }

  private def isCowRef(spark: SparkSession,
      plan: LogicalPlan): Boolean = plan match {
    case SubqueryAlias(_, child) => isCowRef(spark, child)
    case r: UnresolvedRelation => isCowParts(spark, r.multipartIdentifier)
    case t: UnresolvedTable => isCowParts(spark, t.multipartIdentifier)
    case _ => false
  }

  /** Same routing rule as [[routableRef]] over a parsed multipart
    * identifier: the backticked-absolute-path form by literal-cow or
    * registered catalog; `cat.ns.table` by registered catalog only.
    */
  private def isCowParts(spark: SparkSession,
      parts: Seq[String]): Boolean = parts match {
    case Seq(cat, path) if path.startsWith("/") =>
      cat.equalsIgnoreCase("cow") || isCowCatalog(spark, cat)
    case Seq(cat, _, _) => isCowCatalog(spark, cat)
    case _ => false
  }

  private def targetOf(plan: LogicalPlan): LogicalPlan = plan match {
    case DeleteFromTable(t, _) => t
    case UpdateTable(t, _, _) => t
    case m: MergeIntoTable => m.targetTable
    case other => throw new IllegalArgumentException(
      s"not a DML statement: ${other.getClass.getSimpleName}")
  }

  /** Execute one statement with the commit id ALLOCATED here — head+1
    * at execution time, the same id discipline as the named catalog's
    * INSERT path ([[graft.catalog.CowWrites]]) — so a SQL-string user
    * never handles ids. VACUUM / RESTORE ignore ids by contract; DML
    * and OPTIMIZE commit as head+1, and a concurrent writer taking
    * the id first fails the statement LOUDLY (the commit paths return
    * silently when superseded — for a fire-and-forget SQL statement
    * that silence would be a lost write). A DML that matches zero
    * rows commits nothing and leaves the head unchanged — not an
    * error. `mode` defaults to [[Auto]]: the manifest's own byte
    * count routes UPDATE / DELETE between COW rewrites and
    * merge-on-read deletion vectors.
    */
  def execAuto(spark: SparkSession, sql: String, keep: Int = 2,
      mode: DmlMode = Auto,
      morThresholdBytes: Long = 128L * 1024 * 1024): Unit = sql match {
    case VacuumRe(_, _, _, _, _) | VacuumHoursRe(_, _, _, _, _) |
        RestoreRe(_, _, _, _, _) | CloneRe(_, _, _, _, _, _, _, _, _) =>
      exec(spark, 0L, sql, keep, mode, morThresholdBytes) // id unused
    case OptimizeRe(c, p, ns, t, _, _) if routableRef(spark, c, p) =>
      val root = refRoot(spark, c, p, ns, t)
      val id = headOf(spark, root) + 1L
      require(exec(spark, id, sql, keep, mode, morThresholdBytes),
        s"OPTIMIZE raced a concurrent commit at $root (id $id was " +
          s"taken by another writer) — retry: $sql")
    case OptimizePlainRe(c, p, ns, t, _) if routableRef(spark, c, p) =>
      val root = refRoot(spark, c, p, ns, t)
      val id = headOf(spark, root) + 1L
      require(exec(spark, id, sql, keep, mode, morThresholdBytes),
        s"OPTIMIZE raced a concurrent commit at $root (id $id was " +
          s"taken by another writer) — retry: $sql")
    case _ =>
      val plan = parser.parsePlan(sql)
      plan match {
        case _: AddCheckConstraint | _: DropConstraint =>
          // constraint DDL commits no manifest — no id, no race window
          // (the CHECK set publishes via its own atomic rename)
          exec(spark, 0L, sql, keep, mode, morThresholdBytes)
        case _ =>
          val root = rootOf(spark, targetOf(plan))
          val head = headOf(spark, root)
          // ownership, not head-movement: the old `now == head+1` check
          // was satisfied by a CONCURRENT writer committing head+1 in
          // the window between headOf and the lease — this statement's
          // silent no-op then read as success (lost write). The commit
          // paths now report whether THIS call published (or benignly
          // matched nothing); false is always a lost race.
          require(exec(spark, head + 1L, sql, keep, mode,
              morThresholdBytes),
            s"statement raced a concurrent commit at $root (id " +
              s"${head + 1L} was taken by another writer) — retry: $sql")
      }
  }

  /** Parse an OPTIMIZE statement's optional WHERE text into the
    * partition-scope Column (None when absent).
    */
  private def parsedWhere(spark: SparkSession, w: String): Option[Column] =
    Option(w).map(_.trim).filter(_.nonEmpty).map(t =>
      org.apache.spark.sql.graftbridge.Bridge.column(
        spark.sessionState.sqlParser.parseExpression(t)))

  private def headOf(spark: SparkSession, root: String): Long =
    CowTable.currentManifest(spark, root).map(_.id).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))

  private[graft] def useMor(spark: SparkSession, root: String,
      mode: DmlMode, thresholdBytes: Long): Boolean = mode match {
    case Cow => false
    case Mor => true
    case Auto => CowTable.currentManifest(spark, root)
      .exists(_.files.map(_.bytes).sum > thresholdBytes)
  }

  /** A stock SQL parser of our own: `execDml` CANNOT use the session's
    * parser once [[graft.plans.CowSqlParser]] is installed — the
    * session parser would hand the DML text straight back as a
    * [[graft.plans.CowStatementCommand]] (infinite mutual recursion),
    * not as the UPDATE/DELETE/MERGE AST this interpreter consumes.
    * `SparkSqlParser` reads the active session's SQLConf thread-local,
    * so dialect settings still apply.
    */
  private lazy val parser =
    new org.apache.spark.sql.execution.SparkSqlParser()

  /** Does the expression carry a subquery anywhere? */
  private def hasSubquery(e: Expression): Boolean =
    e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst
      .expressions.SubqueryExpression])

  /** The ONE refusal for subqueries in the position the engine does
    * not take them — MERGE ON (shared by the textual path and the
    * analyzer conversion so the two surfaces can never drift). ON is
    * refused BY DESIGN, not as a gap: a subquery there would change
    * MATCHEDNESS per pair, which this engine's one-row-per-pair merge
    * does not express (Delta draws the same line). Every other DML
    * position takes subqueries: UPDATE/DELETE conditions, UPDATE SET
    * values, MERGE WHEN-clause conditions, and MERGE SET/VALUES.
    */
  private[graft] def refuseSubqueries(
      es: Seq[Expression], what: String): Unit =
    es.foreach(e => require(!hasSubquery(e),
      s"$what with a subquery is not supported BY DESIGN — a subquery " +
        "in MERGE ON would change matchedness per joined pair, which " +
        "this engine's one-row-per-pair merge does not express; " +
        "materialize the subquery into the source view (or a pre-" +
        "filtered source query) instead. Subqueries ARE supported in " +
        "UPDATE/DELETE conditions, UPDATE SET values, MERGE WHEN-" +
        "clause conditions, and MERGE SET/VALUES"))

  /** A per-frame condition for the textual path. Plain predicates
    * round-trip through `Expression.sql` (the proven text form) as a
    * late-binding Column; conditions carrying SUBQUERIES cannot
    * (`.sql` renders `listquery()`/`exists()` pseudo-functions that do
    * not re-parse) — those ANALYZE ONCE against the target's current
    * snapshot and bind per scan frame exactly like the named form
    * ([[graft.plans.CowBoundDml.bind]]). Analyzing once matters
    * beyond convenience: the DML primitives evaluate the condition on
    * TWO frames (hit scan, rewrite), and an unresolved subquery would
    * re-resolve its inner relations per frame — a concurrent commit to
    * a referenced table between the two phases would make the
    * statement act on a row mix consistent with NEITHER snapshot.
    */
  private def condOf(spark: SparkSession, root: String,
      e: Expression): org.apache.spark.sql.DataFrame
      => org.apache.spark.sql.Column =
    if (!hasSubquery(e)) _ => expr(e.sql)
    else {
      val probe = CowV2.read(spark, root).getOrElse(
        throw new IllegalStateException(
          s"no committed snapshot at $root"))
      val analyzed = probe
        .where(org.apache.spark.sql.graftbridge.Bridge.column(e))
        .queryExecution.analyzed
      val (cond, out) = analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          (f.condition, f.child.output)
      }.getOrElse(throw new IllegalStateException(
        s"DML condition did not analyze to a filter: ${e.sql}"))
      graft.plans.CowBoundDml.bind(cond, out)
    }

  /** A per-frame SET VALUE for the textual path — the projection twin
    * of [[condOf]]: plain expressions round-trip as text; values
    * carrying subqueries (`SET x = (SELECT …)`, correlated included)
    * analyze ONCE against the target's current snapshot (a Project —
    * legal for scalar AND predicate subqueries in Spark 4) and bind
    * per scan frame. Analyzing once pins the inner relations to one
    * snapshot across the primitives' multiple evaluation frames, the
    * same reasoning as [[condOf]]. Spark's own scalar-subquery
    * machinery enforces the at-most-one-row rule at runtime.
    */
  private def valueOf(spark: SparkSession, root: String,
      e: Expression): org.apache.spark.sql.DataFrame
      => org.apache.spark.sql.Column =
    if (!hasSubquery(e)) _ => expr(e.sql)
    else {
      val probe = CowV2.read(spark, root).getOrElse(
        throw new IllegalStateException(
          s"no committed snapshot at $root"))
      val analyzed = probe
        .select(org.apache.spark.sql.graftbridge.Bridge.column(e)
          .as("__set_v"))
        .queryExecution.analyzed
      val (value, out) = analyzed.collectFirst {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          (p.projectList.last match {
            case a: org.apache.spark.sql.catalyst.expressions.Alias =>
              a.child
            case x => x
          }, p.child.output)
      }.getOrElse(throw new IllegalStateException(
        s"SET value did not analyze to a projection: ${e.sql}"))
      graft.plans.CowBoundDml.bind(value, out)
    }

  private def execDml(spark: SparkSession, id: Long, sql: String,
      keep: Int, mode: DmlMode, thresholdBytes: Long): Boolean =
    parser.parsePlan(sql) match {
      case DeleteFromTable(table, cond) =>
        val root = rootOf(spark, table)
        val c = condOf(spark, root, cond)
        if (useMor(spark, root, mode, thresholdBytes))
          CowTable.deleteWhereDvBy(spark, root, id, c, keep = keep)
        else
          CowTable.deleteWhereBy(spark, root, id, c, keep = keep)
      case UpdateTable(table, assignments, cond) =>
        val root = rootOf(spark, table)
        val c = cond.map(condOf(spark, root, _))
          .getOrElse((_: org.apache.spark.sql.DataFrame) => expr("true"))
        val setPairs = assignments.map(a =>
          setNameOf(a.key) -> valueOf(spark, root, a.value))
        val sets: org.apache.spark.sql.DataFrame
            => Map[String, org.apache.spark.sql.Column] =
          df => setPairs.map { case (n, f) => n -> f(df) }.toMap
        // subquery-bearing SETs force the matched-only split (ANSI)
        val subqSets = assignments.exists(a => hasSubquery(a.value))
        if (useMor(spark, root, mode, thresholdBytes))
          CowTable.updateWhereDvBy(spark, root, id, c, sets, keep = keep,
            setsSubquery = subqSets)
        else
          CowTable.updateWhereBy(spark, root, id, c, sets, keep = keep,
            setsSubquery = subqSets)
      case m: MergeIntoTable =>
        execMerge(spark, id, m, keep)
      // constraint DDL: commits NO manifest (the CHECK set is table
      // metadata beside the snapshots); ADD validates the current data
      // in one scan (Delta's ADD CONSTRAINT semantics, inside
      // setCheckConstraints), DROP is O(1) — a shrunk set cannot
      // invalidate data every commit already passed
      case ac: AddCheckConstraint =>
        val root = rootOf(spark, leafRef(ac.child).getOrElse(ac.child))
        val ck = ac.checkConstraint
        require(!ck.userProvidedCharacteristic.enforced.contains(false),
          s"CHECK ${ck.name} NOT ENFORCED: cow constraints are real " +
            "invariants (every commit validates) — an unenforced " +
            "claim would be a lie to downstream readers")
        val cur = CowTable.checkConstraints(spark, root)
        require(!cur.contains(ck.name),
          s"constraint ${ck.name} already exists at $root (DROP it first)")
        CowTable.setCheckConstraints(spark, root,
          cur + (ck.name -> ck.condition))
        true // the CHECK set publishes via its own atomic rename
      case dc: DropConstraint =>
        val root = rootOf(spark, leafRef(dc.child).getOrElse(dc.child))
        val cur = CowTable.checkConstraints(spark, root)
        if (cur.contains(dc.name))
          CowTable.setCheckConstraints(spark, root, cur - dc.name,
            validate = false)
        else require(dc.ifExists, s"no constraint ${dc.name} at $root")
        true
      case other => throw new IllegalArgumentException(
        s"CowSql executes UPDATE / DELETE FROM / MERGE INTO / " +
          s"ADD|DROP CONSTRAINT; got ${other.getClass.getSimpleName}")
    }

  private def setNameOf(key: Expression): String = key match {
    case attr: UnresolvedAttribute =>
      // single-part target column; a qualified t.col normalizes too
      attr.nameParts.last
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
          if isCowParts(spark, r.multipartIdentifier) =>
        rootOfParts(spark, r.multipartIdentifier)
      case t: UnresolvedTable // ALTER forms parse the target as a table
          if isCowParts(spark, t.multipartIdentifier) =>
        rootOfParts(spark, t.multipartIdentifier)
      case other => throw new IllegalArgumentException(
        "table reference must be cow.`<table root path>` or " +
          "<registered cow catalog>.<ns>.<table>, got " +
          other.getClass.getSimpleName)
    }

  private def rootOfParts(spark: SparkSession, parts: Seq[String]): String =
    parts match {
      case Seq(_, path) if path.startsWith("/") => path
      case Seq(cat, ns, table) => s"${warehouseOf(spark, cat)}/$ns/$table"
      case _ => throw new IllegalArgumentException(
        "cow references are cow.`<absolute path>` or " +
          s"<catalog>.<ns>.<table>, got ${parts.mkString(".")}")
    }

  private def aliasOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(ident, _) => Some(ident.name)
    case _ => None
  }

  private def execMerge(
      spark: SparkSession, id: Long, m: MergeIntoTable,
      keep: Int): Boolean = {
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
    // clause conditions: plain ones round-trip as text; ones carrying
    // SUBQUERIES analyze ONCE against the target's current snapshot
    // (aliased t×s probe — the same one-snapshot discipline as condOf)
    // and bind against the merge's flat join frame at execution
    lazy val targetDf = CowV2.read(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    // ONE t×s analysis probe serves clause conditions (a Filter shape)
    // and SET/VALUES values (a Project shape): the one-snapshot
    // discipline and the output-splitting contract live here once
    def bindViaProbe(
        shape: org.apache.spark.sql.DataFrame
          => org.apache.spark.sql.DataFrame,
        extract: PartialFunction[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          (Expression, Seq[org.apache.spark.sql.catalyst.expressions
            .Attribute])],
        what: String, e: Expression, cls: ClauseClass)
        : org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column = {
      val probed = shape(targetDf.alias("t").crossJoin(source.alias("s")))
        .queryExecution.analyzed
      val (bound, out) = probed.collectFirst(extract).getOrElse(
        throw new IllegalStateException(s"$what: ${e.sql}"))
      val (tOut, sOut) = out.splitAt(targetDf.columns.length)
      // SCOPE CHECK (ADVICE r16): the t×s probe sees BOTH sides, so
      // Spark's per-clause scope rules (MergeIntoTable analysis) must
      // be re-imposed here — a by-source clause has no source row and
      // a not-matched clause no target row; binding such a reference
      // would silently evaluate it against the out-of-class side's
      // NULL columns instead of refusing. References include a
      // correlated subquery's outer attributes.
      def offenders(side: Seq[org.apache.spark.sql.catalyst.expressions
          .Attribute]): Seq[String] = {
        val set = org.apache.spark.sql.catalyst.expressions
          .AttributeSet(side)
        bound.references.iterator.filter(set.contains)
          .map(_.name).toSeq.distinct.sorted
      }
      cls match {
        case BySourceClause =>
          val bad = offenders(sOut)
          require(bad.isEmpty,
            s"WHEN NOT MATCHED BY SOURCE cannot reference source " +
              s"column(s) ${bad.mkString(", ")} in ${e.sql}: by-source " +
              "rows have no source side (Spark refuses this at " +
              "analysis; evaluating against NULLs would corrupt)")
        case InsertClause =>
          val bad = offenders(tOut)
          require(bad.isEmpty,
            s"WHEN NOT MATCHED (INSERT) cannot reference target " +
              s"column(s) ${bad.mkString(", ")} in ${e.sql}: " +
              "not-matched rows have no target side (Spark refuses " +
              "this at analysis; evaluating against NULLs would " +
              "corrupt)")
        case MatchedClause => ()
      }
      graft.plans.CowBoundDml.bindMerge(bound, tOut, sOut)
    }
    def boundOf(e: Expression, cls: ClauseClass)
        : org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column =
      bindViaProbe(
        _.where(org.apache.spark.sql.graftbridge.Bridge.column(e)),
        { case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            (f.condition, f.child.output) },
        "MERGE clause condition did not analyze to a filter", e, cls)
    // the TEXTUAL twin of bindViaProbe's scope check: plain (no
    // subquery) conditions and values round-trip as text and evaluate
    // over the merge's joined frame, whose out-of-class struct is
    // NULL — an `s.` reference in a by-source clause (or `t.` in an
    // insert clause) would silently compute against NULLs. The
    // aliases are fixed (`t`/`s` — the statement contract), so the
    // parsed qualifiers decide; an unqualified out-of-class name
    // fails resolution loudly on its own.
    def refuseTextualOutOfClass(e: Expression, cls: ClauseClass): Unit = {
      val forbidden = cls match {
        case BySourceClause => Some(("s",
          "WHEN NOT MATCHED BY SOURCE cannot reference source"))
        case InsertClause => Some(("t",
          "WHEN NOT MATCHED (INSERT) cannot reference target"))
        case MatchedClause => None
      }
      forbidden.foreach { case (alias, what) =>
        // ANY reference whose head is the forbidden alias — dotted
        // (s.w), subscripted (s['w'] parses as extraction over the
        // one-part attribute), or the bare struct (isnotnull(s)) —
        // is out-of-class by construction: the joined frame's only
        // top-level columns are the two class structs
        val bad = e.collect {
          case a: UnresolvedAttribute
              if a.nameParts.head.equalsIgnoreCase(alias) => a.sql
        }.distinct.sorted
        require(bad.isEmpty,
          s"$what column(s) ${bad.mkString(", ")} in ${e.sql}: the " +
            "clause's row class has no such side (Spark refuses this " +
            "at analysis; evaluating against NULLs would corrupt)")
      }
    }
    def condPair(e: Option[Expression], cls: ClauseClass)
        : (Option[String],
          Option[org.apache.spark.sql.DataFrame
            => org.apache.spark.sql.Column]) = e match {
      case Some(x) if hasSubquery(x) => (None, Some(boundOf(x, cls)))
      case other =>
        other.foreach(refuseTextualOutOfClass(_, cls))
        (other.map(_.sql), None)
    }
    // SET/VALUES values carrying subqueries (round-16): analyze ONCE
    // as a projection over the same aliased t×s probe (one-snapshot
    // discipline) and bind against the merge's flat join frame — the
    // projection twin of boundOf, exactly as valueOf is of condOf
    def boundValOf(e: Expression, cls: ClauseClass)
        : org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column =
      bindViaProbe(
        _.select(org.apache.spark.sql.graftbridge.Bridge.column(e)
          .as("__mv")),
        { case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
            (p.projectList.last match {
              case a: org.apache.spark.sql.catalyst.expressions.Alias =>
                a.child
              case x => x
            }, p.child.output) },
        "MERGE SET/VALUES value did not analyze to a projection", e, cls)
    type BV = Map[String, org.apache.spark.sql.DataFrame
      => org.apache.spark.sql.Column]
    def splitAssigns(as: Seq[Assignment], cls: ClauseClass)
        : (Map[String, String], BV) = {
      val (subq, plain) = as.partition(a => hasSubquery(a.value))
      plain.foreach(a => refuseTextualOutOfClass(a.value, cls))
      (plain.map(a => targetColOf(a) -> a.value.sql).toMap,
        subq.map(a => targetColOf(a) -> boundValOf(a.value, cls)).toMap)
    }
    type BC = Option[org.apache.spark.sql.DataFrame
      => org.apache.spark.sql.Column]
    val matched: Seq[(MergeClause, BC, BV)] = m.matchedActions.map {
      case DeleteAction(c) =>
        val (tc, bc) = condPair(c, MatchedClause)
        (MatchedDelete(tc), bc, Map.empty: BV)
      case UpdateAction(c, assigns, _) =>
        val (tc, bc) = condPair(c, MatchedClause)
        val (txt, bv) = splitAssigns(assigns, MatchedClause)
        (MatchedUpdate(txt, tc), bc, bv)
      case UpdateStarAction(c) =>
        val (tc, bc) = condPair(c, MatchedClause)
        (MatchedUpdate(starSet, tc), bc, Map.empty: BV)
      case other => throw new IllegalArgumentException(
        s"unsupported MATCHED action $other")
    }
    val notMatched: Seq[(MergeClause, BC, BV)] = m.notMatchedActions.map {
      case InsertAction(c, assigns) =>
        val (tc, bc) = condPair(c, InsertClause)
        val (txt, bv) = splitAssigns(assigns, InsertClause)
        (NotMatchedInsert(txt, tc), bc, bv)
      case InsertStarAction(c) =>
        val (tc, bc) = condPair(c, InsertClause)
        (NotMatchedInsert(Map.empty, tc), bc, Map.empty: BV)
      case other => throw new IllegalArgumentException(
        s"unsupported NOT MATCHED action $other")
    }
    val bySource: Seq[(MergeClause, BC, BV)] =
      m.notMatchedBySourceActions.map {
        case DeleteAction(c) =>
          val (tc, bc) = condPair(c, BySourceClause)
          (NotMatchedBySourceDelete(tc), bc, Map.empty: BV)
        case UpdateAction(c, assigns, _) =>
          val (tc, bc) = condPair(c, BySourceClause)
          val (txt, bv) = splitAssigns(assigns, BySourceClause)
          (NotMatchedBySourceUpdate(txt, tc), bc, bv)
        case other => throw new IllegalArgumentException(
          s"unsupported NOT MATCHED BY SOURCE action $other")
      }
    val pairs = matched ++ notMatched ++ bySource
    CowTable.mergeInto(spark, root, id, source, keys,
      tgtCols.partCols, pairs.map(_._1), keep = keep,
      boundConds =
        if (pairs.exists(_._2.nonEmpty)) pairs.map(_._2) else Nil,
      boundSets =
        if (pairs.exists(_._3.nonEmpty)) pairs.map(_._3) else Nil)
  }
}
