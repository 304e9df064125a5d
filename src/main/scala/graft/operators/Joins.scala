package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference (and stock Spark) lack as
  * first-class relations: AS-OF join and point-in-interval RANGE join.
  * Both are built from Spark primitives (union + window, bucket + equi-join)
  * rather than nested-loop conditions, so neither degenerates to a
  * broadcast-nested-loop O(n·m) plan at scale.
  */
object Joins {

  /** AS-OF join: for every left row, attach the greatest `rightTs` of the
    * same `key` with `rightTs <= leftTs` (the "latest observation at or
    * before" semantic of DuckDB's ASOF JOIN / kdb aj).
    *
    * Distributed formulation: tag and union both inputs, then one window
    * scan per key ordered by (ts, rightness) — right rows sort before left
    * rows at equal timestamps so equal-ts observations are visible. The
    * only shuffle is the window's partition on `key` (same cost class as a
    * groupBy on the join key; no per-key collect, no nested loop). Rows
    * with no prior observation get NULL.
    *
    * Returns the left rows + one `asofTsCol` column with the matched right
    * timestamp (payload-free: at duplicate (key, ts) right rows the
    * timestamp is still deterministic where an arbitrary payload would not
    * be).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      asofTsCol: String = "asof_ts"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__is_right", lit(0))
      .withColumn("__ts", col(leftTs))
      .withColumn("__rts", lit(null).cast("long"))
    val rCols = l.columns.toSeq
    val r = right.select(col(key), col(rightTs))
      .withColumn("__is_right", lit(1))
      .withColumn("__ts", col(rightTs))
      .withColumn("__rts", col(rightTs))
    val rAligned = rCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(rCols.map(col): _*)

    // right rows (__is_right desc) first at equal __ts → inclusive `<=`
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(rCols.map(col): _*).unionByName(rAligned)
      .withColumn(asofTsCol, max(col("__rts")).over(w))
      .filter(col("__is_right") === 0)
      .select((leftCols :+ asofTsCol).map(col): _*)
  }

  /** Point-in-interval RANGE join: pairs every point row (`pointTs`) with
    * every interval row whose `[startCol, endCol]` contains it (bounds
    * inclusive).
    *
    * Distributed formulation: quantize time into `bucketWidth`-sized cells;
    * each point lands in exactly ONE cell, each interval is exploded to
    * every cell it overlaps, and the pair space is an equi-join on the cell
    * id with an exact BETWEEN filter after it. Shuffle volume is
    * O(points + Σ interval_span/bucketWidth) — never the O(n·m) a raw
    * theta join plans as a nested loop. Each (point, interval) pair appears
    * exactly once because the point's single cell meets each covering
    * interval's explosion once.
    *
    * `bucketWidth` should be on the order of the typical interval length:
    * too small explodes intervals into many cells, too large packs
    * unrelated rows into one cell.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("__cell", floor(col(pointTs) / bucketWidth))
    val iv = intervals.withColumn("__cell",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    p.join(iv, Seq("__cell"))
      .filter(col(pointTs).between(col(startCol), col(endCol)))
      .drop("__cell")
  }
}
