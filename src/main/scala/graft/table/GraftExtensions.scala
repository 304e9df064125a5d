package graft.table

import org.apache.spark.sql.SparkSessionExtensions

/** Injection of the graft planning surface, either by config
  * (`spark.sql.extensions=graft.table.GraftExtensions` — applied when the
  * SparkContext is first created) or programmatically
  * (`builder.withExtensions(new GraftExtensions)` — works on an existing
  * context too).
  *
  * injects [[ResolveGraftScan]] (SQL time travel / per-query snapshot
  * resolution over [[GraftRelation]] views) and registers the `cosine_sim`
  * SQL function. `GraftCatalog.register` injects the same rule at runtime
  * through `spark.experimental` for sessions built without the config —
  * both paths are idempotent and can coexist.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(session => ResolveGraftScan(session))
    // SQL UPDATE / MERGE INTO over GraftSparkCatalog tables → the
    // library's CoW/MoR commit paths (must run during resolution: the
    // relation is read-only DSv2, so an untouched UpdateTable would fail
    // CheckAnalysis as unsupported)
    e.injectResolutionRule(session => ResolveGraftDml(session))
    // SQL VIEWS over graft catalogs (Iceberg view parity): statements
    // intercept at PARSE time (Spark's ResolveSessionCatalog would
    // refuse v2-catalog views before any resolution rule runs), reads
    // splice the stored SQL during resolution
    e.injectParser((session, delegate) => new GraftViewParser(session, delegate))
    e.injectResolutionRule(session => GraftViewSubstitution(session))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.CosineSimilarity].getName, "cosine_sim"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.DotProduct].getName, "dot_product"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.DotProduct(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("zorder_key"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.ZOrderKey].getName, "zorder_key"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.ZOrderKey(exprs)))
    // the text pipeline's shared tokenizer (trim → lowercase → \s+ split,
    // empties dropped) as a SQL function — the same kernel every dedup/
    // text query builds on, so SQL users segment identically
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("tokens"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.Tokens].getName, "tokens"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.Tokens(exprs.head, lowercase = true)))
  }
}
