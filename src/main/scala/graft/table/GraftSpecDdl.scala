package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StringType

/** SQL partition-spec EVOLUTION + ref DDL (Iceberg's Spark extension
  * grammar, re-implemented over the library calls):
  *
  * {{{
  *   ALTER TABLE cat.db.t ADD PARTITION FIELD days(ts)
  *   ALTER TABLE cat.db.t DROP PARTITION FIELD bucket(16, id)
  *   ALTER TABLE cat.db.t REPLACE PARTITION FIELD days(ts) WITH months(ts)
  *   ALTER TABLE cat.db.t CREATE TAG v1 [AS OF VERSION 3]
  *   ALTER TABLE cat.db.t CREATE BRANCH audit
  *   ALTER TABLE cat.db.t DROP TAG v1 / DROP BRANCH audit
  *   ALTER TABLE cat.db.t WRITE ORDERED BY (c1, c2)
  *   ALTER TABLE cat.db.t WRITE DISTRIBUTED BY PARTITION [LOCALLY ORDERED BY c]
  *   ALTER TABLE cat.db.t WRITE UNORDERED
  * }}}
  *
  * Spark's own grammar has no spelling for any of these (its
  * `ADD PARTITION` expects a Hive `(col=value)` spec), so the
  * statements arrive at [[GraftViewParser]] as parse FAILURES — the
  * delegate throws, and the fallback recognizes the forms against a
  * registered graft catalog (explicit `cat.db.t`, the same stance as
  * views/DML). Any other text rethrows the delegate's original error
  * untouched.
  *
  * Semantics are the library's: the new spec applies to FUTURE writes
  * only, no existing byte rewrites, eras mix in the manifests and reads
  * group files by their own spec. Transform syntax and validation come
  * from [[PartitionField.parseSpec]] (identity, `bucket(n,col)`,
  * `days/months/years/hours(col)`, `truncate(w,col)`). Field matching
  * for DROP/REPLACE is whitespace-insensitive on the spec string.
  * Sessions without the parser extension use `CALL
  * cat.system.set_partition_spec(table, spec)` — same machinery, works
  * everywhere.
  */
object GraftSpecDdl {

  private val AddRe =
    """(?is)\s*ALTER\s+TABLE\s+([^\s]+)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*""".r
  private val DropRe =
    """(?is)\s*ALTER\s+TABLE\s+([^\s]+)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*""".r
  private val ReplaceRe =
    """(?is)\s*ALTER\s+TABLE\s+([^\s]+)\s+REPLACE\s+PARTITION\s+FIELD\s+(.+?)\s+WITH\s+(.+?)\s*""".r
  private val CreateRefRe =
    """(?is)\s*ALTER\s+TABLE\s+([^\s]+)\s+CREATE\s+(BRANCH|TAG)\s+(\w[\w.-]*)(\s+AS\s+OF\s+VERSION\s+(\d+))?\s*""".r
  private val DropRefRe =
    """(?is)\s*ALTER\s+TABLE\s+([^\s]+)\s+DROP\s+(BRANCH|TAG)\s+(\w[\w.-]*)\s*""".r
  // Iceberg's write-order DDL family: the clause tail parses in
  // [[parseWriteClause]] (distribution and/or ordering, or UNORDERED)
  private val WriteRe =
    """(?is)\s*ALTER\s+TABLE\s+([^\s]+)\s+WRITE\s+(.+?)\s*;?\s*""".r

  private def identParts(ident: String): Seq[String] =
    ident.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))

  /** Recognize one of the three statements against a graft catalog;
    * None = not ours (caller rethrows the delegate's parse error). */
  def parse(spark: SparkSession, sqlText: String): Option[LogicalPlan] = {
    def target(ident: String): Option[Seq[String]] = {
      val parts = identParts(ident)
      if (parts.length == 3 && GraftViews.isGraftCatalog(spark, parts.head))
        Some(parts)
      else None
    }
    sqlText match {
      case ReplaceRe(ident, oldF, newF) =>
        target(ident).map(GraftAlterSpecCommand(_,
          add = Seq(newF.trim), drop = Seq(oldF.trim)))
      case AddRe(ident, f) =>
        target(ident).map(GraftAlterSpecCommand(_,
          add = Seq(f.trim), drop = Nil))
      case DropRe(ident, f) =>
        target(ident).map(GraftAlterSpecCommand(_,
          add = Nil, drop = Seq(f.trim)))
      case CreateRefRe(ident, kind, ref, _, asOf) =>
        target(ident).map(GraftRefDdlCommand(_,
          create = true, branch = kind.equalsIgnoreCase("branch"),
          ref = ref, asOf = Option(asOf).map(_.toLong)))
      case DropRefRe(ident, kind, ref) =>
        target(ident).map(GraftRefDdlCommand(_,
          create = false, branch = kind.equalsIgnoreCase("branch"),
          ref = ref, asOf = None))
      case WriteRe(ident, clause) =>
        for {
          parts <- target(ident)
          cmd <- parseWriteClause(parts, clause.trim)
        } yield cmd
      case _ => None
    }
  }

  /** `WRITE …` clause tail → the property edit (None = not a write-order
    * clause; the caller rethrows the original parse error):
    *
    * {{{
    *   WRITE ORDERED BY (c1, c2)                      — graft.write.sort
    *   WRITE LOCALLY ORDERED BY c1                    — same property
    *   WRITE DISTRIBUTED BY PARTITION                 — …distribution=hash
    *   WRITE DISTRIBUTED BY PARTITION [LOCALLY] ORDERED BY c1 — both
    *   WRITE UNORDERED                                — clears both
    * }}}
    *
    * The properties are the long-standing write levers
    * ([[GraftTable.PropWriteSort]] range-partitions + sorts every data
    * write so files land range-disjoint; [[GraftTable.PropWriteDistribution]]
    * `hash` clusters rows by partition value so each table partition is
    * written by one task). Column validation happens in the command
    * (against the live schema); `DESC` / `NULLS` modifiers refuse —
    * the sort property orders ascending. */
  private def parseWriteClause(
      parts: Seq[String], clause: String): Option[LogicalPlan] = {
    val UnorderedRe = """(?is)UNORDERED""".r
    val DistRe = """(?is)DISTRIBUTED\s+BY\s+PARTITION""".r
    val DistOrderRe =
      """(?is)DISTRIBUTED\s+BY\s+PARTITION\s+(?:LOCALLY\s+)?ORDERED\s+BY\s+(.+)""".r
    val OrderRe = """(?is)(?:LOCALLY\s+)?ORDERED\s+BY\s+(.+)""".r
    def cols(s: String): Seq[String] = {
      val stripped = s.trim.stripPrefix("(").stripSuffix(")")
      stripped.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { c =>
        require(!c.matches("(?is).*\\s+(DESC|NULLS)\\b.*"),
          s"write sort '$c' — graft.write.sort orders ascending with " +
            "default null placement (DESC / NULLS modifiers unsupported)")
        c.replaceAll("(?is)\\s+ASC$", "").stripPrefix("`").stripSuffix("`")
      }
    }
    clause match {
      case UnorderedRe() =>
        Some(GraftWriteOrderCommand(parts, sort = None,
          distribution = None, clear = true))
      case DistOrderRe(cs) =>
        Some(GraftWriteOrderCommand(parts, sort = Some(cols(cs)),
          distribution = Some("hash"), clear = false))
      case DistRe() =>
        Some(GraftWriteOrderCommand(parts, sort = None,
          distribution = Some("hash"), clear = false))
      case OrderRe(cs) =>
        Some(GraftWriteOrderCommand(parts, sort = Some(cols(cs)),
          distribution = None, clear = false))
      case _ => None
    }
  }
}

/** Apply one `ALTER TABLE … WRITE …` statement: validate the sort
  * columns against the live schema and commit the metadata-only
  * property edit. Returns (write_distribution, write_sort). */
case class GraftWriteOrderCommand(
    parts: Seq[String],
    sort: Option[Seq[String]],
    distribution: Option[String],
    clear: Boolean) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("write_distribution", StringType, nullable = false)(),
    AttributeReference("write_sort", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val Seq(cat, db, name) = parts: @unchecked
    val wh = GraftViews.warehouseOf(spark, cat)
    val dir = s"$wh/$db/$name"
    require(GraftTable.exists(dir), s"no graft table $db.$name in $cat")
    val t = GraftTable.load(dir)
    sort.toSeq.flatten.foreach(c =>
      require(t.schema.fieldNames.contains(c),
        s"write sort column '$c' is not in the schema of $db.$name"))
    val t2 =
      if (clear) t.updateProperties(Map.empty,
        removals = Set(GraftTable.PropWriteSort,
          GraftTable.PropWriteDistribution))
      else t.updateProperties(
        sort.map(cs =>
          GraftTable.PropWriteSort -> cs.mkString(",")).toMap ++
        distribution.map(GraftTable.PropWriteDistribution -> _).toMap)
    Seq(Row(
      t2.properties.getOrElse(GraftTable.PropWriteDistribution, "none"),
      t2.properties.getOrElse(GraftTable.PropWriteSort, "")))
  }
}

/** `ALTER TABLE … CREATE|DROP BRANCH|TAG` (Iceberg's ref DDL, over the
  * library's WAP surface): `CREATE TAG name [AS OF VERSION id]` pins a
  * retention-anchoring named snapshot (default: current); `CREATE
  * BRANCH name` forks the write–audit–publish branch off the CURRENT
  * snapshot (branches fork from the tip — audit an older state via a
  * tag + time travel instead, so `AS OF VERSION` on a branch refuses);
  * `DROP` removes the ref (a branch dies with its unpublished
  * candidate data). Retention policies take the `CALL
  * create_tag/create_branch` spelling — the DDL stays the quick path.
  * Returns (ref, type, snapshot_id). */
case class GraftRefDdlCommand(
    parts: Seq[String],
    create: Boolean,
    branch: Boolean,
    ref: String,
    asOf: Option[Long]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("ref", StringType, nullable = false)(),
    AttributeReference("type", StringType, nullable = false)(),
    AttributeReference("snapshot_id", org.apache.spark.sql.types.LongType,
      nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val Seq(cat, db, name) = parts: @unchecked
    val wh = GraftViews.warehouseOf(spark, cat)
    val dir = s"$wh/$db/$name"
    require(GraftTable.exists(dir), s"no graft table $db.$name in $cat")
    val t = GraftTable.load(dir)
    val kind = if (branch) "branch" else "tag"
    (create, branch) match {
      case (true, true) =>
        require(asOf.isEmpty,
          "branches fork from the CURRENT snapshot — CREATE TAG … AS OF " +
            "VERSION pins an older state; branch it after a rollback, or " +
            "audit the tag via time travel")
        t.createBranch(ref)
        Seq(Row(ref, kind, t.branches(ref)._1))
      case (true, false) =>
        val id = asOf.getOrElse(t.log.current.getOrElse(
          throw new IllegalArgumentException(
            s"empty table $db.$name has no snapshot to tag")).snapshotId)
        t.tag(ref, id)
        Seq(Row(ref, kind, id))
      case (false, true) =>
        t.dropBranch(ref)
        Seq(Row(ref, kind, null))
      case (false, false) =>
        t.dropTag(ref)
        Seq(Row(ref, kind, null))
    }
  }
}

/** Apply one ADD/DROP/REPLACE partition-field statement: validate the
  * edit against the CURRENT spec, parse-check the result against the
  * schema ([[GraftTable.updatePartitionSpec]] does), commit the
  * metadata-only spec change. Returns (previous_spec, new_spec). */
case class GraftAlterSpecCommand(
    parts: Seq[String],
    add: Seq[String],
    drop: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("previous_spec", StringType, nullable = false)(),
    AttributeReference("new_spec", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val Seq(cat, db, name) = parts: @unchecked
    val wh = GraftViews.warehouseOf(spark, cat)
    val dir = s"$wh/$db/$name"
    require(GraftTable.exists(dir), s"no graft table $db.$name in $cat")
    val t = GraftTable.load(dir)
    val cur = t.partitionColumns
    def norm(e: String) = e.replaceAll("\\s+", "").toLowerCase
    drop.foreach(d => require(cur.exists(c => norm(c) == norm(d)),
      s"partition field '$d' is not in the current spec " +
        s"(${if (cur.isEmpty) "unpartitioned" else cur.mkString(", ")})"))
    add.foreach(a => require(!cur.exists(c => norm(c) == norm(a)),
      s"partition field '$a' is already in the spec"))
    val next =
      cur.filterNot(c => drop.exists(d => norm(d) == norm(c))) ++ add
    t.updatePartitionSpec(next)
    Seq(Row(
      if (cur.isEmpty) "" else cur.mkString(", "),
      if (next.isEmpty) "" else next.mkString(", ")))
  }
}
