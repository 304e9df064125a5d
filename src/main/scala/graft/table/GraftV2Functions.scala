package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** DSv2 catalog functions backing storage-partitioned joins.
  *
  * When a scan reports `KeyGroupedPartitioning(bucket(n, col), …)`,
  * Spark resolves the `bucket` transform against the relation's
  * [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]; the
  * bound function's `canonicalName` is what proves two co-bucketed
  * graft tables share a layout (so their join needs NO shuffle), and
  * `produceResult` is what Spark evaluates if it ever re-buckets the
  * other side of such a join (`v2.bucketing.shuffle.enabled`).
  *
  * The semantics MUST be bit-identical to the write path
  * ([[BucketField.writeExpr]]: `pmod(xxhash64(col), n).cast(int)`), so
  * the bound function evaluates through the very same Catalyst
  * [[XxHash64]] expression rather than reimplementing the hash —
  * including its null behavior (a null value leaves the seed
  * untouched, exactly like the write-side derivation).
  */
private[table] object GraftV2Functions {

  val names: Seq[String] =
    Seq("bucket", "years", "months", "days", "hours", "truncate")

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketUnbound)
    case "years" | "months" | "days" | "hours" =>
      Some(TimeUnitUnbound(name))
    case "truncate" => Some(TruncateUnbound)
    case _ => None
  }

  /** `years/months/days/hours(col)` — the time-transform ordinals, used
    * by the streaming sink's transform-clustered write distribution
    * (and available to key-grouped reads). Bit-identical to the write
    * side: evaluation delegates to the same [[PartitionField.derive]]
    * the directory layout uses. */
  final case class TimeUnitUnbound(unit: String) extends UnboundFunction {
    override def name(): String = unit
    override def description(): String =
      s"$unit(col): the graft $unit-transform ordinal (UTC)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$unit expects one argument, got $inputType")
      val dt = inputType.fields(0).dataType
      dt match {
        case DateType | TimestampType | TimestampNTZType =>
          GraftTimeUnitFunction(unit, dt)
        case other => throw new UnsupportedOperationException(
          s"graft $unit transform takes date/timestamp values, got $other")
      }
    }
  }

  object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): the graft string-prefix transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == StringType,
        s"truncate expects (width int, value string), got $inputType")
      GraftTruncateFunction
    }
  }

  /** Spark binds `bucket(n, col)` with a two-field struct:
    * (numBuckets int, value) — the transform's argument order. */
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): pmod(xxhash64(col), n) — the graft table layout hash"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket expects (numBuckets int, value), got $inputType")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket's first argument must be int, got ${inputType.fields(0).dataType}")
      val dt = inputType.fields(1).dataType
      dt match {
        case IntegerType | LongType | StringType | DateType |
             TimestampType | TimestampNTZType | ShortType | ByteType =>
          GraftBucketFunction(dt)
        case other => throw new UnsupportedOperationException(
          s"graft bucket transform does not hash $other values")
      }
    }
  }
}

/** Bound `bucket(n, value)`: evaluates the write path's own
  * `xxhash64` Catalyst expression on the value argument, then
  * `pmod(hash, n)` — identical bits to [[BucketField.writeExpr]], so a
  * bucket id computed here always lands in the directory the writer
  * chose. */
/** Bound time-unit transform: evaluates through the SAME
  * [[PartitionField.derive]] the writer's directory layout uses, so an
  * ordinal computed here always matches the partition a row landed in.
  * Null in → null out (time transforms are null-propagating, like the
  * write side's null partition). */
final case class GraftTimeUnitFunction(unit: String, valueType: DataType)
    extends ScalarFunction[java.lang.Integer] {

  override def name(): String = unit
  override def canonicalName(): String =
    s"graft.$unit(${valueType.catalogString})"
  override def inputTypes(): Array[DataType] = Array(valueType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = true

  @transient private lazy val field: PartitionField = unit match {
    case "years" => YearsField("c")
    case "months" => MonthsField("c")
    case "days" => DaysField("c")
    case "hours" => HoursField("c")
  }

  override def produceResult(input: InternalRow): java.lang.Integer =
    if (input.isNullAt(0)) null
    else {
      val v = valueType match {
        case DateType => input.getInt(0): Any
        case _ => input.getLong(0): Any // timestamp micros
      }
      field.derive(v, valueType).asInstanceOf[Int]
    }
}

/** Bound `truncate(w, value)` — [[TruncateField.derive]]'s substring. */
case object GraftTruncateFunction
    extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
  override def name(): String = "truncate"
  override def canonicalName(): String = "graft.truncate(string)"
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, StringType)
  override def resultType(): DataType = StringType
  override def isResultNullable: Boolean = true
  override def produceResult(input: InternalRow)
      : org.apache.spark.unsafe.types.UTF8String =
    if (input.isNullAt(1)) null
    else input.getUTF8String(1).substringSQL(1, input.getInt(0))
}

final case class GraftBucketFunction(valueType: DataType)
    extends ScalarFunction[java.lang.Integer] {

  override def name(): String = "bucket"
  // type-qualified: xxhash64 of an int and of a long differ for equal
  // numeric values, so only same-typed bucket layouts may co-locate
  override def canonicalName(): String =
    s"graft.bucket(${valueType.catalogString})"
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false

  @transient private lazy val hash =
    XxHash64(Seq(BoundReference(1, valueType, nullable = true)), 42L)

  override def produceResult(input: InternalRow): java.lang.Integer = {
    val n = input.getInt(0)
    val h = hash.eval(input).asInstanceOf[Long]
    val m = h % n
    (if (m < 0) m + n else m).toInt
  }
}
