package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Property sweep for the commit-time exact-count bookkeeping: across
  * random legal DML chains (append / overwrite / CoW delete / deferred
  * predicate delete / equality delete / MoR upsert / positional delete /
  * compaction / rollback — all three deferred forms stacking freely on
  * one table), the metadata identity
  *
  *   totalRecords − positionalDead − pendingDead − equalityDead
  *     == count of the visible-rows scan
  *
  * must hold after EVERY commit whenever all pending entries carry their
  * commit-time counts (they do by default). The chains also exercise the
  * segmented manifests' retain/append/reuse paths incidentally — a
  * segment-accounting bug would show up as a wrong totalRecords or a
  * missing/resurrected row in the scan.
  */
class MorCountPropertySpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: Seq[(Long, String)]) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2)
    spark.createDataFrame(rdd, schema)
  }

  test("metadata count identity holds across random legal DML chains") {
    val rnd = new scala.util.Random(sys.env.getOrElse("GRAFT_FUZZ_SEED", "42").toLong)
    var nextId = 0L
    def freshRows(n: Int): Seq[(Long, String)] =
      (0 until n).map { _ =>
        nextId += 1
        nextId -> s"v$nextId"
      }

    for (trial <- 1 to 5) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-morprop$trial").toString
      val t = GraftTable.create(s"$dir/t", schema)
      t.append(mkDf(freshRows(8)), Some(1000L))

      def existingIds(): Seq[Long] =
        t.read(spark).select("id").collect().map(_.getLong(0)).toSeq

      def checkIdentity(step: String): Unit = {
        val total = t.log.current
          .map(s => Manifest.read(s"${t.dir}/${s.manifestList}").totalRecords)
          .getOrElse(0L)
        val scanned = t.read(spark).count()
        (t.pendingDeletedCount, t.equalityDeletedCount) match {
          case (Some(pd), Some(ed)) =>
            val meta = total - t.positionalDeletedCount - pd - ed
            assert(meta == scanned,
              s"trial $trial after $step: metadata count $meta " +
                s"(total=$total pos=${t.positionalDeletedCount} " +
                s"pend=$pd eq=$ed) != scan $scanned")
          case other =>
            fail(s"trial $trial after $step: counts degraded " +
              s"unexpectedly: $other")
        }
      }

      var ts = 2000L
      for (step <- 1 to 9) {
        ts += 1000L
        val hasPending = t.pendingDeletes.nonEmpty
        val hasEquality = t.equalityDeletes.nonEmpty
        val ids = existingIds()
        val legal = Seq.newBuilder[String]
        legal += "append"
        legal += "overwrite"
        legal += "compact"
        // ALL THREE deferred forms compose on one table now — the
        // identity must keep holding while they stack in any order.
        // CoW rewrites stay off predicate/equality-pending tables in
        // THIS chain only because they DEGRADE those counts by design
        // (degrade, never lie) and the checker asserts exactness;
        // MorSoundnessSpec drives the CoW composition for row content.
        legal += "deferred"
        if (ids.nonEmpty) {
          legal += "equality"; legal += "upsert"; legal += "positional"
        }
        if (!hasPending && !hasEquality && ids.nonEmpty) legal += "cowDelete"
        if (!hasPending && !hasEquality) legal += "overwriteWhere"
        val ops = legal.result()
        val op = ops(rnd.nextInt(ops.size))
        op match {
          case "append" => t.append(mkDf(freshRows(1 + rnd.nextInt(4))), Some(ts))
          case "overwrite" => t.overwrite(mkDf(freshRows(3)), Some(ts))
          case "overwriteWhere" =>
            // atomic slice replacement of a trailing id range
            val lo = nextId - rnd.nextInt(4)
            t.overwriteWhere(spark, col("id") >= lo,
              mkDf(freshRows(2)), Some(ts))
          case "compact" =>
            t.compact(spark, smallerThanBytes = Long.MaxValue, Some(ts))
          case "deferred" =>
            // predicate over a random id slice (may or may not match)
            val lo = nextId - rnd.nextInt(6)
            t.deleteDeferred(spark, col("id") >= lo, Some(ts))
          case "equality" =>
            val victims = rnd.shuffle(ids).take(1 + rnd.nextInt(2)) :+ 999999L
            import spark.implicits._
            t.deleteEquality(spark, victims.toDF("id"), Seq("id"), Some(ts))
          case "upsert" =>
            val k = ids(rnd.nextInt(ids.size))
            t.mergeEquality(spark,
              mkDf(Seq(k -> "upserted") ++ freshRows(1)), Seq("id"), Some(ts))
          case "positional" =>
            val k = ids(rnd.nextInt(ids.size))
            t.deletePositional(spark, col("id") === k, Some(ts))
          case "cowDelete" =>
            val k = ids(rnd.nextInt(ids.size))
            t.delete(spark, col("id") === k, Some(ts))
        }
        checkIdentity(s"step $step ($op)")
      }
      GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
