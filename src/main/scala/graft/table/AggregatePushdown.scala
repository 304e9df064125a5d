package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** Answers group-less `COUNT(*)` / `COUNT(col)` / `MIN(col)` / `MAX(col)`
  * exactly from manifest metadata — the DSv2 aggregate-pushdown
  * (`SupportsPushDownAggregates`) backend for graft tables.
  *
  * `SELECT count(*) FROM t` on a 100 TB table is a metadata question:
  * the manifest already carries per-file record counts and per-column
  * min/max/null stats from the parquet footers at write time. When every
  * file can contribute an EXACT answer, the whole aggregate collapses to
  * a driver-local one-row scan — zero tasks, zero file I/O. The DSv2
  * surface this serves already refuses merge-on-read-pending state
  * (`GraftSparkCatalog.newScanBuilder`), so manifest totals ARE the
  * visible-row totals there.
  *
  * Refusal (return None → Spark plans the normal scan) is the default on
  * any doubt:
  *  - any grouping, DISTINCT, or an aggregate function beyond the four;
  *  - MIN/MAX on strings/binary (parquet writers may truncate binary
  *    bounds — a truncated max is not the max) and on float/double
  *    (writer stats are unreliable in the presence of NaN, which Spark
  *    orders above every value);
  *  - a file with a missing or unparsable stat for the asked column,
  *    unless its stats PROVE it holds no values for it (all-null files
  *    contribute nothing to MIN/MAX, exactly as the SQL semantics skip
  *    nulls).
  */
object AggregatePushdown {

  /** Exact answer for `agg` over `entries`, or None. Group-less: one
    * row. `GROUP BY` is served when every group expression is
    * PARTITION-ALIGNED — an identity partition column, a `days(c)`-
    * partitioned date column, or `CAST(c AS DATE)` over a `days(c)` /
    * `hours(c)` layout (the "daily counts" question on the recommended
    * events layout; `date_trunc` never reaches this surface — Spark
    * cannot translate it to a v2 expression — so the cast is the
    * servable spelling). Manifest partition values are the exact group
    * keys and every layout partition maps into exactly ONE group, so
    * per-group totals/bounds are final without touching a data file.
    * Misaligned expressions (a coarser layout than the grouping —
    * `CAST(ts AS DATE)` over `months(ts)` — or anything else) refuse. */
  def localScan(
      agg: Aggregation,
      schema: StructType,
      partitionFields: Seq[PartitionField],
      entries: Seq[DataFileEntry],
      describe: String): Option[Scan] = {
    val extractors: Seq[(StructField, DataFileEntry => Option[Any])] =
      agg.groupByExpressions().toSeq.map(e =>
        groupExtractor(e, schema, partitionFields, entries)
          .getOrElse(return None))
    if (extractors.isEmpty) answerGroup(agg, schema, entries, describe)
    else {
      val keyed = entries.map(e =>
        (extractors.map(_._2(e).getOrElse(return None)), e))
      val groups = keyed.groupBy(_._1)
      // deterministic TYPED output order (Spark re-sorts above; this
      // only keeps the local scan's row order stable run-to-run)
      val keyTypes = extractors.map(_._1.dataType)
      val keyOrdering: Ordering[Seq[Any]] = (x: Seq[Any], y: Seq[Any]) => {
        var i = 0; var c = 0
        while (c == 0 && i < keyTypes.length) {
          c = cellCompare(keyTypes(i), x(i), y(i)); i += 1
        }
        c
      }
      val rows = groups.toSeq.sortBy(_._1)(keyOrdering).map {
        case (keyCells, groupEntries) =>
          answerGroup(agg, schema, groupEntries.map(_._2), describe) match {
            case Some(s: GraftLocalAggScan) =>
              (s.readSchema(), keyCells ++ s.values)
            case _ => return None
          }
      }
      val aggSchema = rows.headOption.map(_._1)
        .getOrElse(return None)
      Some(new GraftLocalAggScan(
        StructType(extractors.map(_._1) ++ aggSchema.fields),
        rows.map(_._2), describe))
    }
  }

  /** Typed comparison of two Catalyst-internal group-key cells (nulls
    * first). Group keys only ever hold the partition-value types
    * [[groupValue]]/ordinal extractors emit; anything exotic falls back
    * to a deterministic string compare. */
  private def cellCompare(dt: DataType, a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case _ => dt match {
      case StringType =>
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      case BooleanType =>
        java.lang.Boolean.compare(
          a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
      case IntegerType | DateType =>
        Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType =>
        java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      case _: DecimalType =>
        a.asInstanceOf[Decimal].compare(b.asInstanceOf[Decimal])
      case _ => a.toString.compareTo(b.toString)
    }
  }

  /** One group expression → (output field, per-entry internal group
    * key). None refuses the pushdown; a per-entry None (missing
    * partition key — another spec era's file) also refuses. */
  private def groupExtractor(
      e: org.apache.spark.sql.connector.expressions.Expression,
      schema: StructType,
      partitionFields: Seq[PartitionField],
      entries: Seq[DataFileEntry])
      : Option[(StructField, DataFileEntry => Option[Any])] = {

    def covered(fieldName: String): Boolean =
      entries.forall(_.partition.contains(fieldName))
    // days/hours ordinals are written as plain ints; a group key parse
    // failure refuses (None) rather than guessing
    def ordinal(f: PartitionField, toKey: Int => Any)
        : DataFileEntry => Option[Any] =
      en => en.partition.get(f.fieldName).flatMap {
        case None => Some(null) // null partition: SQL null group key
        case Some(s) => s.toIntOption.map(toKey)
      }
    // CAST(c AS DATE) over TimestampType follows the SESSION timezone;
    // the layout ordinals are UTC-derived, so only a UTC session aligns
    def tzSafe(dt: DataType): Boolean = dt match {
      case TimestampType =>
        scala.util.Try(java.time.ZoneId.of(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
          .normalized() == java.time.ZoneOffset.UTC).getOrElse(false)
      case TimestampNTZType | DateType => true
      case _ => false
    }

    e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        val name = r.fieldNames()(0)
        val field = schema.fields.find(_.name.equalsIgnoreCase(name))
          .getOrElse(return None)
        partitionFields.find(f =>
          f.isIdentity && f.fieldName.equalsIgnoreCase(name)) match {
          case Some(_) if covered(field.name) =>
            Some((field, en => groupValue(field, en.partition(field.name))))
          case _ =>
            // GROUP BY a days(d)-partitioned DATE column: the ordinal
            // IS the epoch day
            partitionFields.collectFirst {
              case f @ DaysField(src)
                  if src.equalsIgnoreCase(name) &&
                    field.dataType == DateType && covered(f.fieldName) =>
                (field, ordinal(f, identity[Int]))
            }
        }
      case c: org.apache.spark.sql.connector.expressions.Cast
          if c.dataType() == DateType =>
        c.expression() match {
          case r: NamedReference if r.fieldNames().length == 1 =>
            val name = r.fieldNames()(0)
            val field = schema.fields.find(_.name.equalsIgnoreCase(name))
              .getOrElse(return None)
            if (!tzSafe(field.dataType)) return None
            val out = StructField(s"CAST(${field.name} AS DATE)", DateType)
            partitionFields.collectFirst {
              case f @ DaysField(src)
                  if src.equalsIgnoreCase(name) && covered(f.fieldName) =>
                (out, ordinal(f, identity[Int]))
              case f @ HoursField(src)
                  if src.equalsIgnoreCase(name) && covered(f.fieldName) =>
                // every hour partition lies in exactly one day
                (out, ordinal(f, h => Math.floorDiv(h, 24)))
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** The partition-value string in its Catalyst-internal group-key
    * form (None refuses the pushdown; a null partition value is a SQL
    * null group key). */
  private def groupValue(f: StructField, v: Option[String]): Option[Any] =
    v match {
      case None => Some(null)
      case Some(s) => f.dataType match {
        case StringType =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        case DateType =>
          scala.util.Try(
            java.time.LocalDate.parse(s).toEpochDay.toInt).toOption
        case dt =>
          ColumnStats.parse(s, dt).flatMap(internal(dt, _))
      }
    }

  private def answerGroup(
      agg: Aggregation,
      schema: StructType,
      entries: Seq[DataFileEntry],
      describe: String): Option[Scan] = {
    val fns = agg.aggregateExpressions().toSeq
    if (fns.isEmpty) return None
    val cells = fns.map {
      case _: CountStar =>
        Some((StructField("count(*)", LongType, nullable = false),
          java.lang.Long.valueOf(entries.map(_.recordCount).sum)))
      case c: Count if !c.isDistinct =>
        column(c.column, schema).flatMap { f =>
          val perFile = entries.map(e =>
            e.stats.get(f.name).flatMap(_.nullCount)
              .map(n => e.recordCount - n))
          if (perFile.exists(_.isEmpty)) None
          else Some((StructField(s"count(${f.name})", LongType,
            nullable = false),
            java.lang.Long.valueOf(perFile.flatten.sum)))
        }
      case m: Min =>
        column(m.column, schema).flatMap(f =>
          bound(f, entries, pickMax = false).map(v =>
            (StructField(s"min(${f.name})", f.dataType), v)))
      case m: Max =>
        column(m.column, schema).flatMap(f =>
          bound(f, entries, pickMax = true).map(v =>
            (StructField(s"max(${f.name})", f.dataType), v)))
      case _ => None
    }
    if (cells.exists(_.isEmpty)) None
    else {
      val (fields, values) = cells.flatten.unzip
      Some(new GraftLocalAggScan(StructType(fields), Seq(values), describe))
    }
  }

  /** The referenced TOP-LEVEL schema column, if the aggregate's child is
    * a plain column reference. */
  private def column(
      e: org.apache.spark.sql.connector.expressions.Expression,
      schema: StructType): Option[StructField] = e match {
    case r: NamedReference => r.fieldNames() match {
      case Array(name) =>
        schema.fields.find(_.name.equalsIgnoreCase(name))
      case _ => None
    }
    case _ => None
  }

  /** Types whose footer min/max are exact (no truncation, no NaN). */
  private def exactBounds(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Fold per-file bounds into the table MIN or MAX (Catalyst-internal
    * value; null when every row is null). None refuses the pushdown. */
  private def bound(
      f: StructField,
      entries: Seq[DataFileEntry],
      pickMax: Boolean): Option[Any] = {
    if (!exactBounds(f.dataType)) return None
    // files provably holding no values for the column are skipped (SQL
    // MIN/MAX skip nulls); anything else must contribute an exact bound
    val contributing = entries.filterNot { e =>
      e.stats.get(f.name).exists(st =>
        st.nullCount.isDefined && st.nullCount == st.valueCount)
    }
    val bounds = contributing.map(e =>
      e.stats.get(f.name).flatMap(st =>
        if (pickMax) st.typedMax(f.dataType) else st.typedMin(f.dataType)))
    if (bounds.exists(_.isEmpty)) return None
    val flat = bounds.flatten
    if (flat.isEmpty) return Some(null) // zero contributing files: SQL null
    var acc = flat.head
    for (v <- flat.tail) ColumnStats.compare(acc, v) match {
      case Some(c) => if (if (pickMax) c < 0 else c > 0) acc = v
      case None => return None // incomparable pair — refuse, don't guess
    }
    internal(f.dataType, acc)
  }

  /** Parsed stat value → Catalyst-internal representation. */
  private def internal(dt: DataType, v: Any): Option[Any] = dt match {
    case BooleanType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType => Some(v)
    case d: DecimalType => v match {
      case bd: BigDecimal =>
        val dec = Decimal(bd)
        if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
      case _ => None
    }
    case _ => None
  }
}

/** Driver-local scan of precomputed rows: Spark's [[LocalScan]] plans
  * it as a LocalTableScan — no tasks, no files. One row for group-less
  * aggregates; one row per partition group for pushed GROUP BYs. */
final class GraftLocalAggScan(
    schema: StructType,
    rowsData: Seq[Seq[Any]],
    desc: String)
    extends LocalScan {
  /** Single-row accessor for composing grouped answers. */
  private[table] def values: Seq[Any] = rowsData.head
  override def rows(): Array[InternalRow] =
    rowsData.map(r => new GenericInternalRow(r.toArray): InternalRow).toArray
  override def readSchema(): StructType = schema
  override def description(): String = desc
}
