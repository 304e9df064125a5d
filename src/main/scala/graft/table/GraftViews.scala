package graft.table

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedView}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL VIEWS over graft catalogs (Iceberg view parity, rebuilt for
  * Spark): versioned view metadata stored in the warehouse next to the
  * tables, full `CREATE [OR REPLACE] VIEW` / `ALTER VIEW … AS` /
  * `DROP VIEW` / `SHOW VIEWS` / `SELECT` support.
  *
  * Spark 4 ships the DSv2 `ViewCatalog` interface but no analyzer/exec
  * path that drives it — every engine integration (Iceberg's included)
  * intercepts the view statements itself. This rebuild does the same
  * with TWO small hooks, both registered by [[GraftExtensions]]:
  *
  *  - [[GraftViewParser]] (injectParser): a delegating parser that
  *    post-processes the PARSED plan — `CreateView`/`AlterViewAs`/
  *    `DropView`/`ShowViews` nodes whose (explicit, three-part) target
  *    names a graft catalog become graft commands. Parse-time surgery
  *    sidesteps the analyzer-ordering trap: Spark's own
  *    `ResolveSessionCatalog` throws "catalog does not support views"
  *    for v2 catalogs BEFORE any injected resolution rule could run.
  *  - [[GraftViewSubstitution]] (injectResolutionRule): resolves
  *    `SELECT … FROM cat.db.view` by splicing the stored SQL's parsed
  *    plan (recursively — nested views expand eagerly with an explicit
  *    cycle guard, so the analyzer's fixed point never spins).
  *
  * The metadata file (`<warehouse>/<db>/<view>/view.json`) is
  * VERSIONED like the Iceberg view spec: every `CREATE OR REPLACE` /
  * `ALTER … AS` appends a new version (SQL text + captured schema +
  * column aliases + timestamp) and moves `current_version_id`; history
  * stays queryable via [[GraftViews.load]]. Views share the table
  * namespace, so creation refuses a name a TABLE holds and vice versa
  * ([[GraftSparkCatalog.createTable]] checks back).
  */
object GraftViews {

  /** Age after which an orphaned `.view-claim` (crashed committer) is
    * adopted by the next DDL instead of blocking it. */
  private[table] val StaleClaimMs: Long = 10L * 60 * 1000

  final case class ViewVersion(
      versionId: Long,
      sql: String,
      createdMs: Long,
      schemaJson: String,
      aliases: Seq[String])

  final case class ViewMeta(
      currentVersionId: Long,
      versions: Seq[ViewVersion],
      properties: Map[String, String]) {
    def current: ViewVersion =
      versions.find(_.versionId == currentVersionId).getOrElse(
        throw new IllegalStateException(
          s"view metadata names missing version $currentVersionId"))
  }

  private def metaFile(wh: String, db: String, name: String) =
    Paths.get(wh, db, name, "view.json")

  def exists(wh: String, db: String, name: String): Boolean =
    Files.exists(metaFile(wh, db, name))

  def load(wh: String, db: String, name: String): ViewMeta = {
    val p = metaFile(wh, db, name)
    require(Files.exists(p), s"view $db.$name does not exist under $wh")
    val m = graft.util.Json.parseObject(Files.readString(p))
    ViewMeta(
      m("current_version_id").asInstanceOf[Long],
      m("versions").asInstanceOf[Seq[Any]].map { v =>
        val vm = v.asInstanceOf[Map[String, Any]]
        ViewVersion(
          vm("version_id").asInstanceOf[Long],
          vm("sql").asInstanceOf[String],
          vm("created_ms").asInstanceOf[Long],
          vm("schema_json").asInstanceOf[String],
          vm.getOrElse("aliases", Seq.empty[Any])
            .asInstanceOf[Seq[Any]].map(_.toString))
      },
      m.getOrElse("properties", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.toString })
  }

  private def write(wh: String, db: String, name: String, meta: ViewMeta): Unit = {
    val p = metaFile(wh, db, name)
    Files.createDirectories(p.getParent)
    graft.util.Json.writeFileAtomic(p.toString, graft.util.Json.write(Map(
      "format_version" -> 1L,
      "current_version_id" -> meta.currentVersionId,
      "versions" -> meta.versions.map(v => Map[String, Any](
        "version_id" -> v.versionId,
        "sql" -> v.sql,
        "created_ms" -> v.createdMs,
        "schema_json" -> v.schemaJson,
        "aliases" -> v.aliases)),
      "properties" -> meta.properties)))
  }

  /** List view names under `wh/db` (directories holding a view.json). */
  def list(wh: String, db: String): Seq[String] = {
    val d = Paths.get(wh, db)
    if (!Files.isDirectory(d)) return Nil
    val st = Files.list(d)
    try {
      val b = Seq.newBuilder[String]
      st.iterator().forEachRemaining { p =>
        if (Files.exists(p.resolve("view.json"))) b += p.getFileName.toString
      }
      b.result().sorted
    } finally st.close()
  }

  def isGraftCatalog(spark: SparkSession, cat: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$cat")
      .contains(classOf[GraftSparkCatalog].getName)

  def warehouseOf(spark: SparkSession, cat: String): String =
    spark.conf.get(s"spark.sql.catalog.$cat.warehouse")

  /** Three-part name targeting a registered graft catalog? (Views keep
    * the explicit `cat.db.name` spelling — no current-catalog
    * shorthand, same stance as the DML surface.) */
  def isGraftViewTarget(spark: SparkSession, parts: Seq[String]): Boolean =
    parts.length == 3 && isGraftCatalog(spark, parts.head)

  def isView(spark: SparkSession, parts: Seq[String]): Boolean =
    isGraftViewTarget(spark, parts) &&
      exists(warehouseOf(spark, parts.head), parts(1), parts(2))

  /** Refuse storing view text that references a session/global TEMP
    * view: the stored TEXT re-plans per reading session, so a captured
    * temp name would silently resolve to a different relation (or fail)
    * in another session — the same rejection Spark's own persistent
    * views and the Iceberg view spec apply. Walked on the PARSED plan
    * (subqueries included) so nothing is resolved-away first. */
  private[table] def requireNoTempRefs(
      spark: SparkSession, viewName: String, sql: String): Unit = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val catalog = spark.sessionState.catalog
    val offenders = parsed.collectWithSubqueries {
      case u: UnresolvedRelation
          if catalog.isTempView(u.multipartIdentifier) =>
        u.multipartIdentifier.mkString(".")
    }.distinct
    require(offenders.isEmpty,
      s"view $viewName references temporary view(s) " +
        s"${offenders.mkString(", ")} — stored view text re-plans in " +
        "sessions where temp objects do not exist; reference durable " +
        "tables or views instead")
  }

  private[table] def upsertVersion(
      wh: String, db: String, name: String,
      sql: String, schemaJson: String, aliases: Seq[String],
      props: Map[String, String], replaceExisting: Boolean): Unit = {
    // read-modify-write of view.json guarded by an O_EXCL claim (same
    // discipline as GraftTable.commit): two concurrent CREATE OR
    // REPLACE / ALTER calls would otherwise both read one version list
    // and silently drop an appended version — the loser fails loudly.
    val dirP = Paths.get(wh, db, name)
    Files.createDirectories(dirP)
    val claim = dirP.resolve(".view-claim")
    // claims carry an OWNER token: adoption of a stale claim is a
    // delete+retake, and two committers can both see the same stale
    // claim — ownership is settled by verifying the claim's content
    // AFTER acquisition (exactly one token survives; the loser fails
    // loudly instead of deleting the winner's live claim)
    val token = java.util.UUID.randomUUID().toString
    def acquire(retryStale: Boolean): Unit =
      try Files.write(claim, token.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // a JVM crash between claim and finally-delete must not
          // block the view's DDL forever: a claim older than the
          // staleness window is adopted (deleted + retaken) — a live
          // committer holds its claim for milliseconds, same recovery
          // stance as the table-commit markers
          val stale = try {
            System.currentTimeMillis() -
              Files.getLastModifiedTime(claim).toMillis > StaleClaimMs
          } catch { case _: java.io.IOException => true /* just freed */ }
          if (retryStale && stale) {
            Files.deleteIfExists(claim)
            acquire(retryStale = false)
          } else throw new java.util.ConcurrentModificationException(
            s"view $db.$name is being modified by a concurrent committer " +
              s"(stale claims older than ${StaleClaimMs / 1000}s are " +
              "adopted automatically)")
      }
    acquire(retryStale = true)
    val owned =
      try new String(Files.readAllBytes(claim), "UTF-8") == token
      catch { case _: java.io.IOException => false }
    if (!owned) throw new java.util.ConcurrentModificationException(
      s"view $db.$name claim was adopted by a concurrent committer " +
        "during stale-claim recovery; retry the DDL")
    try {
      if (exists(wh, db, name)) {
        require(replaceExisting,
          s"view $db.$name already exists (use CREATE OR REPLACE / ALTER)")
        val old = load(wh, db, name)
        val vid = old.versions.map(_.versionId).max + 1
        write(wh, db, name, ViewMeta(vid,
          old.versions :+ ViewVersion(vid, sql, System.currentTimeMillis(),
            schemaJson, aliases),
          if (props.nonEmpty) old.properties ++ props else old.properties))
      } else {
        write(wh, db, name, ViewMeta(1L,
          Seq(ViewVersion(1L, sql, System.currentTimeMillis(), schemaJson,
            aliases)),
          props))
      }
    } finally Files.deleteIfExists(claim)
  }

  /** Multipart identifier of the view-statement target nodes the parser
    * hands us (CreateView wraps UnresolvedIdentifier; ALTER/DROP wrap
    * UnresolvedView or UnresolvedIdentifier depending on the statement). */
  private[table] def identOf(p: LogicalPlan): Option[Seq[String]] = p match {
    case u: UnresolvedIdentifier => Some(u.nameParts)
    case v: UnresolvedView => Some(v.multipartIdentifier)
    case _ => None
  }
}

/** Delegating parser that turns view statements aimed at a graft catalog
  * into graft commands (see [[GraftViews]] for why this must happen at
  * parse time). Everything else — including every other statement and
  * all the identifier/type entry points — forwards verbatim. */
class GraftViewParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftViews._

  private def transform(plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView =>
      identOf(cv.child) match {
        case Some(parts) if isGraftViewTarget(spark, parts) =>
          GraftCreateViewCommand(parts,
            cv.userSpecifiedColumns.map(_._1),
            cv.comment, cv.properties,
            cv.originalText.getOrElse(throw new IllegalArgumentException(
              "CREATE VIEW over a graft catalog needs the original query " +
                "text (internal plan-only views are not supported)")),
            cv.allowExisting, cv.replace)
        case _ => plan
      }
    case av: AlterViewAs =>
      identOf(av.child) match {
        case Some(parts) if isGraftViewTarget(spark, parts) =>
          GraftAlterViewAsCommand(parts, av.originalText)
        case _ => plan
      }
    case dv: DropView =>
      identOf(dv.child) match {
        case Some(parts) if isGraftViewTarget(spark, parts) =>
          GraftDropViewCommand(parts, dv.ifExists)
        case _ => plan
      }
    case sv: ShowViews =>
      sv.namespace match {
        case ns: UnresolvedNamespace
            if ns.multipartIdentifier.length == 2 &&
              isGraftCatalog(spark, ns.multipartIdentifier.head) =>
          GraftShowViewsCommand(ns.multipartIdentifier.head,
            ns.multipartIdentifier(1), sv.pattern, sv.output)
        case _ => plan
      }
    case _ => plan
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    try transform(delegate.parsePlan(sqlText))
    catch {
      // Spark's grammar has no ADD/DROP/REPLACE PARTITION FIELD — the
      // Iceberg-parity spec-evolution DDL arrives as a parse FAILURE;
      // recognize it against graft catalogs, rethrow anything else
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        GraftSpecDdl.parse(spark, sqlText).getOrElse(throw e)
    }
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}

/** Resolves `SELECT … FROM cat.db.view`: the stored SQL's parsed plan
  * splices in under a SubqueryAlias (column aliases honored via the
  * analyzer's own `UnresolvedSubqueryColumnAliases`). Nested views
  * expand eagerly with a cycle guard — the spliced plan never contains
  * another unresolved graft-view reference, so the fixed point is one
  * pass. */
case class GraftViewSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import GraftViews._

  // resolveOperatorsUpWithPruning, NOT transformUp: this rule runs in
  // the analyzer's fixed-point batch on EVERY plan of EVERY query —
  // pattern-bit pruning makes the no-unresolved-relation case O(1)
  // (cached TreePattern bits) and the resolveOperators family skips
  // already-analyzed subtrees, so queries that never touch a view pay
  // nothing (a plain transformUp here cost ~0.2s of re-traversal per
  // DataFrame construction across the bench — measured, not guessed)
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUpWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees
        .TreePattern.UNRESOLVED_RELATION)) {
      case u: UnresolvedRelation if isView(spark, u.multipartIdentifier) =>
        expand(u.multipartIdentifier, Set.empty)
    }

  private def expand(parts: Seq[String], seen: Set[String]): LogicalPlan = {
    val key = parts.map(_.toLowerCase).mkString(".")
    require(!seen.contains(key),
      s"view cycle detected through ${parts.mkString(".")} " +
        s"(chain: ${seen.mkString(" -> ")})")
    val v = load(warehouseOf(spark, parts.head), parts(1), parts(2)).current
    val parsed = spark.sessionState.sqlParser.parsePlan(v.sql)
    val expanded = parsed.transformUp {
      case u: UnresolvedRelation if isView(spark, u.multipartIdentifier) =>
        expand(u.multipartIdentifier, seen + key)
    }
    val aliased =
      if (v.aliases.isEmpty) expanded
      else UnresolvedSubqueryColumnAliases(v.aliases, expanded)
    SubqueryAlias(parts.last, aliased)
  }
}

/** CREATE [OR REPLACE] VIEW cat.db.v [(cols…)] AS <query>. The query is
  * ANALYZED now (against current state) to validate it and capture the
  * version's schema; at read time the stored TEXT re-plans against the
  * then-current state — Iceberg view semantics, not a materialization. */
case class GraftCreateViewCommand(
    parts: Seq[String],
    userColumns: Seq[String],
    comment: Option[String],
    props: Map[String, String],
    sql: String,
    allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val Seq(cat, db, name) = parts: @unchecked
    val wh = GraftViews.warehouseOf(spark, cat)
    if (GraftViews.exists(wh, db, name) && allowExisting && !replace)
      return Nil // IF NOT EXISTS: silent no-op
    require(!GraftTable.exists(s"$wh/$db/$name"),
      s"a graft TABLE named $db.$name already exists — views and tables " +
        "share the namespace")
    GraftViews.requireNoTempRefs(spark, s"$db.$name", sql)
    val analyzed = spark.sql(sql)
    if (userColumns.nonEmpty)
      require(userColumns.length == analyzed.schema.length,
        s"view column list has ${userColumns.length} names, the query " +
          s"produces ${analyzed.schema.length} columns")
    val schema =
      if (userColumns.isEmpty) analyzed.schema
      else org.apache.spark.sql.types.StructType(
        analyzed.schema.fields.zip(userColumns).map { case (f, n) =>
          f.copy(name = n) })
    GraftViews.upsertVersion(wh, db, name, sql, schema.json, userColumns,
      props ++ comment.map("comment" -> _), replaceExisting = replace)
    Nil
  }
}

/** ALTER VIEW cat.db.v AS <query> — a NEW version (history preserved). */
case class GraftAlterViewAsCommand(
    parts: Seq[String],
    sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val Seq(cat, db, name) = parts: @unchecked
    val wh = GraftViews.warehouseOf(spark, cat)
    require(GraftViews.exists(wh, db, name),
      s"view $db.$name does not exist under $wh")
    GraftViews.requireNoTempRefs(spark, s"$db.$name", sql)
    val analyzed = spark.sql(sql)
    GraftViews.upsertVersion(wh, db, name, sql, analyzed.schema.json, Nil,
      Map.empty, replaceExisting = true)
    Nil
  }
}

case class GraftDropViewCommand(
    parts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val Seq(cat, db, name) = parts: @unchecked
    val wh = GraftViews.warehouseOf(spark, cat)
    if (!GraftViews.exists(wh, db, name)) {
      require(ifExists, s"view $db.$name does not exist under $wh")
      return Nil
    }
    GraftTable.deleteRecursively(Paths.get(wh, db, name))
    Nil
  }
}

/** SHOW VIEWS IN cat.db [LIKE 'pattern'] — pattern uses SQL SHOW
  * semantics (`*` any chars, `|` alternation), matching Spark's own
  * filter. Temp views of the session are NOT listed here (they live in
  * the session catalog; Spark lists them for session-catalog SHOW). */
case class GraftShowViewsCommand(
    cat: String,
    db: String,
    pattern: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val names = GraftViews.list(GraftViews.warehouseOf(spark, cat), db)
    val kept = pattern match {
      case None => names
      case Some(p) =>
        val rx = p.split("\\|").map(a =>
          java.util.regex.Pattern.quote(a).replace("*", "\\E.*\\Q"))
          .mkString("(?i)^(", "|", ")$")
        names.filter(_.matches(rx))
    }
    kept.map(n => Row(db, n, false))
  }
}
