package graft.table

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MANIFEST-LEVEL file pruning for VARIANT paths.
  *
  * Spark 4 shreds variant writes by default: each inferred path lands as
  * its own parquet `typed_value` subcolumn with ordinary footer min/max.
  * [[ParquetStats]] harvests those bounds into the manifest under
  * guarded pseudo-column keys (`__v$<col>:<path>:<fam>`), but ONLY for
  * files where every fallback `value` column on the path is entirely
  * null — i.e. every row's value at that path took the typed subcolumn,
  * so the bounds describe ALL non-null extractions (a single
  * type-mixed row routes to the fallback and discards the key:
  * conservative keep, sound).
  *
  * This object is the predicate side: `variant_get(col, '$.path', T)`
  * leaves rewrite into synthetic attribute probes against those keys,
  * typed by the REQUESTED type, so the whole existing [[Pruning]]
  * comparison walk applies unchanged. Type-family rules make the probe
  * sound under casts:
  *
  *  - `long` keys (int32/int64 physical) serve int/long requests — a
  *    stored value outside the requested range makes the bound itself
  *    unparseable under the narrower type, so overflow-capable files
  *    are KEPT (and `failOnError` semantics never change on a kept
  *    file's rows; a skipped file provably holds no in-range match and
  *    no out-of-range value that could throw);
  *  - `string` keys serve string requests only (no cast, byte-order
  *    bounds apply; capped like every manifest string bound);
  *  - doubles are NOT harvested: the engine's bound compare refuses
  *    floating point wholesale (NaN-unordered stats — the standing
  *    NaN-safety stance), so double keys could never prune.
  *
  * Everything else — arrays, decimals, timestamps, non-literal paths,
  * exotic field names — is never harvested and never rewritten:
  * unknown shapes keep files, the standing pruning contract. The PROOF
  * side ([[Pruning.mustMatchAll]]) deliberately ignores these keys:
  * whole-file DML drops stay on first-class column stats only. */
private[graft] object VariantPruning {

  /** Reserved stat-key prefix (also refused as a user column name). */
  val KeyPrefix = "__v$"

  /** Requested-type family a probe may soundly compare under. */
  def family(dt: DataType): Option[String] = dt match {
    case IntegerType | LongType => Some("long")
    case StringType => Some("string")
    case _ => None
  }

  def statKey(col: String, path: String, fam: String): String =
    s"$KeyPrefix$col:$path:$fam"

  /** Type a pseudo stat key by its fam suffix — what segment-ENVELOPE
    * merging needs (the key is not in any schema; field names on the
    * path are [[ParquetStats]]-guarded simple names, so the last ':'
    * always delimits the family). */
  def keyType(key: String): Option[DataType] =
    if (!key.startsWith(KeyPrefix)) None
    else key.substring(key.lastIndexOf(':') + 1) match {
      case "long" => Some(LongType)
      case "string" => Some(StringType)
      case _ => None
    }

  /** Rewrite prunable `variant_get` leaves into synthetic attribute
    * probes; returns the rewritten predicate plus the schema fields
    * typing the probes (by the REQUESTED type — narrowing parses of the
    * stored bounds fail conservative). No variant leaves → `(pred,
    * Nil)` with the original reference returned untouched. */
  def rewrite(
      pred: Expression,
      schema: StructType): (Expression, Seq[StructField]) = {
    val variantCols: Set[String] = schema.fields
      .collect { case f if f.dataType == VariantType => f.name }.toSet
    if (variantCols.isEmpty) return (pred, Nil)
    val extra = scala.collection.mutable.LinkedHashMap[String, StructField]()
    val out = pred.transformUp {
      case VariantGet(a: AttributeReference,
          Literal(p: UTF8String, StringType), t, _, _)
          if variantCols.contains(a.name) && family(t).isDefined =>
        val key = statKey(a.name, p.toString, family(t).get)
        extra.getOrElseUpdate(key, StructField(key, t, nullable = true))
        AttributeReference(key, t, nullable = true)()
    }
    if (extra.isEmpty) (pred, Nil) else (out, extra.values.toSeq)
  }
}
