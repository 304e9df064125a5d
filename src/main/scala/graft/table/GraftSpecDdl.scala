package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StringType

/** SQL partition-spec EVOLUTION (Iceberg's signature DDL — its Spark
  * extension grammar, re-implemented over [[GraftTable
  * .updatePartitionSpec]]):
  *
  * {{{
  *   ALTER TABLE cat.db.t ADD PARTITION FIELD days(ts)
  *   ALTER TABLE cat.db.t DROP PARTITION FIELD bucket(16, id)
  *   ALTER TABLE cat.db.t REPLACE PARTITION FIELD days(ts) WITH months(ts)
  * }}}
  *
  * Spark's own grammar has no spelling for these (its `ADD PARTITION`
  * expects a Hive `(col=value)` spec), so the statements arrive at
  * [[GraftViewParser]] as parse FAILURES — the delegate throws, and the
  * fallback recognizes the three forms against a registered graft
  * catalog (explicit `cat.db.t`, the same stance as views/DML). Any
  * other text rethrows the delegate's original error untouched.
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
      case _ => None
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
