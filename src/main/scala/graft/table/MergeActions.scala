package graft.table

import org.apache.spark.sql.Column

/** Action forms for the general conditional MERGE
  * ([[GraftTable.mergeActions]]) — the full `WHEN MATCHED [AND p] THEN
  * UPDATE/DELETE … WHEN NOT MATCHED [AND p] THEN INSERT …
  * [WHEN NOT MATCHED BY SOURCE …]` surface, evaluated with SQL MERGE
  * semantics: actions are tried in order per row, the first whose
  * condition holds applies, and a row matching no action is untouched
  * (matched / by-source) or skipped (not-matched insert).
  *
  * Conditions and values are Columns over the JOINED row: target columns
  * by their bare names, source columns under the
  * [[GraftTable.MergeSrcPrefix]] prefix (the SQL layer re-targets
  * resolved attribute references accordingly; programmatic callers use
  * `col(GraftTable.MergeSrcPrefix + name)`). Insert conditions/values
  * and by-source conditions/values may only reference their visible
  * side (source / target respectively) — enforced at execution by
  * column resolution against that side's frame.
  *
  * Reference analog: the Hive-delegated DML stance (SURVEY §2.4) — the
  * conditional-action MERGE is the CDC-apply idiom
  * (`WHEN MATCHED AND s.op = 'D' THEN DELETE` …).
  */
sealed trait MergeMatchedAction {
  def condition: Option[Column]
}

/** `WHEN [NOT] MATCHED [AND cond] THEN UPDATE SET c = v, …` — unassigned
  * columns keep their old values; every assignment is evaluated against
  * the old joined row in one projection. */
final case class MergeUpdate(
    condition: Option[Column],
    assigns: Map[String, Column]) extends MergeMatchedAction

/** `WHEN [NOT] MATCHED [AND cond] THEN DELETE`. */
final case class MergeDelete(
    condition: Option[Column]) extends MergeMatchedAction

/** `WHEN NOT MATCHED [AND cond] THEN INSERT (…) VALUES (…)` — columns
  * missing from `values` insert NULL (SQL INSERT column-list
  * semantics). */
final case class MergeInsert(
    condition: Option[Column],
    values: Map[String, Column])
