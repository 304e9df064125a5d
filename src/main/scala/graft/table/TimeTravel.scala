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

  /** Split a predicate into its top-level AND conjuncts. */
  private def conjuncts(pred: Expression): Seq[Expression] = pred match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** A bare `vcol = <literal>` equality (either operand order), if this
    * expression is exactly that shape. */
  private def snapshotEq(e: Expression, vcol: String): Option[Any] = e match {
    case EqualTo(a: Attribute, Literal(v, _))
        if a.name.equalsIgnoreCase(vcol) && v != null => Some(v)
    case EqualTo(Literal(v, _), a: Attribute)
        if a.name.equalsIgnoreCase(vcol) && v != null => Some(v)
    case _ => None
  }

  /** First `vcol = <long literal>` appearing as a TOP-LEVEL AND conjunct.
    *
    * Restricting to conjuncts (not `collectFirst` over the whole tree, as the
    * reference's leaf scan does) keeps results self-consistent: a
    * `vcol = id` under OR or NOT must NOT pin the scan — pinning would make
    * the residual filter return wrong rows (all of snapshot `id`, or none).
    * Non-conjunct occurrences are simply left in the predicate, where they
    * evaluate honestly against the virtual column of the scanned snapshot.
    */
  def extractSnapshotId(pred: Expression, vcol: String): Option[Long] = {
    val found = conjuncts(pred).flatMap(snapshotEq(_, vcol)).headOption
    found.map {
      case l: Long => l
      case i: Int => i.toLong
      case other => other.toString.toLong
    }
  }

  /** Replace each top-level `vcol = lit` conjunct with TRUE so it cannot
    * prune data files (the scan itself is already pinned to that snapshot).
    * Deeper occurrences (under OR/NOT) were not used for pinning and are
    * kept verbatim — they are ordinary predicates on the virtual column. */
  def neutralize(pred: Expression, vcol: String): Expression =
    conjuncts(pred)
      .map(c => if (snapshotEq(c, vcol).isDefined) Literal(true, BooleanType) else c)
      .reduceLeft(And)
}
