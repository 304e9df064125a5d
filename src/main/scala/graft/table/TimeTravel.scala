package graft.table

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.BooleanType

/** Time-travel predicate handling (P16/V3).
  *
  * The reference scans the pushed filter's leaves for the first
  * `snapshot__id = <constant>` and pins the scan to that snapshot
  * (IcebergInputFormat.java:284-299), while the filter factory rewrites the
  * leaf to `alwaysTrue()` so it never prunes data files
  * (IcebergFilterFactory.java:134-136). Statelessness is per-query by
  * construction: the id is extracted from the query's own predicate, never
  * cached (regression the reference guards in TestPredicatePushdown.java:70-75).
  */
object TimeTravel {

  /** First `vcol = <long literal>` leaf in the predicate, if any. */
  def extractSnapshotId(pred: Expression, vcol: String): Option[Long] = {
    val found = pred.collectFirst {
      case EqualTo(a: Attribute, Literal(v, _))
          if a.name.equalsIgnoreCase(vcol) && v != null => v
      case EqualTo(Literal(v, _), a: Attribute)
          if a.name.equalsIgnoreCase(vcol) && v != null => v
    }
    found.map {
      case l: Long => l
      case i: Int => i.toLong
      case other => other.toString.toLong
    }
  }

  /** Replace every `vcol = lit` leaf with TRUE so it cannot prune data files
    * (the scan itself is already pinned to the right snapshot). */
  def neutralize(pred: Expression, vcol: String): Expression =
    pred.transform {
      case EqualTo(a: Attribute, _: Literal) if a.name.equalsIgnoreCase(vcol) =>
        Literal(true, BooleanType)
      case EqualTo(_: Literal, a: Attribute) if a.name.equalsIgnoreCase(vcol) =>
        Literal(true, BooleanType)
    }
}
