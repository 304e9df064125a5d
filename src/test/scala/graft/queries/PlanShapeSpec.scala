package graft.queries

import graft.{SparkEntry, SparkSpecBase}
import graft.table.Manifest

/** Plan-shape gates for the join strategies that matter at cluster scale.
  *
  * The suite's dimension joins legitimately broadcast at every tested SF,
  * so without this spec the SortMergeJoin path — the ONLY viable strategy
  * for fact-fact joins at 100 TB, where neither side fits in memory —
  * would never be exercised. q26 is the designated fact-fact query
  * (lineitem self-join on orderkey); here we put the planner in the
  * cluster-scale state (no side small enough to broadcast, by disabling
  * the size-based conversion) and assert it plans SMJ, not a nested loop
  * or a forced broadcast.
  */
class PlanShapeSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("v19 data-scale scan reads ONLY the pruned month's files") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("v19_graft_bigscan")(spark, sfDir)
    val readFiles = df.inputFiles.toSet
    assert(readFiles.nonEmpty, "v19 read no files")
    // every file read must belong to the 1995-03 partition directory —
    // manifest partition pruning dropped the other ~82 months before I/O
    val offenders = readFiles.filterNot(_.contains("ship_month=1995-03"))
    assert(offenders.isEmpty, s"unpruned files read: $offenders")
    // and the table holds many more partitions than were read
    val allMonths = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(date_format(col("l_shipdate"), "yyyy-MM")).distinct().count()
    assert(allMonths > 50, s"fixture degenerate: only $allMonths months")
  }

  test("t27 index probe reads only the probed buckets' files") {
    val idx = Versioned.invertedIndexFixture(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val probe = idx.scan(spark, Some(col("tok").isin("spark", "join")))
    val read = probe.inputFiles.toSet
    assert(read.nonEmpty)
    // files read come from at most 2 of the 16 bucket directories
    val buckets = read.flatMap(p =>
      "tok_bucket=(\\d+)".r.findFirstMatchIn(p).map(_.group(1)))
    assert(buckets.nonEmpty && buckets.size <= 2,
      s"probe touched buckets $buckets")
    // the curation tombstone was FOLDED at fixture build (foldDeleteDebt):
    // the probe pays no per-read anti-join against the tombstone keys
    assert(!probe.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
      "posting probe still pays the folded tombstone anti-join")
    // and the index holds (far) more buckets than were read
    val all = Manifest
      .read(s"${idx.dir}/${idx.log.current.get.manifestList}")
      .files.flatMap(f => f.partition.get("tok_bucket")).flatten.toSet
    assert(all.size > buckets.size, s"fixture degenerate: $all")
  }

  test("s16 hybrid fusion never globally sorts a corpus-scale relation") {
    val df = SparkEntry.queries("s16_hybrid_rrf")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the final top-20 is a bounded TakeOrderedAndProject, and no
    // range-partitioning exchange (the global-sort shuffle) appears —
    // both legs select their top-50 through the bounded-heap aggregate
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan.take(2000))
  }

  test("q26 fact-fact join plans SortMergeJoin when no side is broadcastable") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("q26_join_fact_fact")(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected SortMergeJoin in the no-broadcast plan:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        "fact-fact join fell back to a product join")
      // the equi-key must drive the shuffle: both sides exchange on orderkey
      assert(plan.contains("hashpartitioning(l_orderkey"),
        "join key did not drive the exchange partitioning")
    }
  }

  test("q26 still answers correctly through the SMJ path") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val smjRows = SparkEntry.queries("q26_join_fact_fact")(spark, sfDir)
        .collect().map(_.toSeq).toSet
      val defRows = withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "10485760") {
        SparkEntry.queries("q26_join_fact_fact")(spark, sfDir)
          .collect().map(_.toSeq).toSet
      }
      assert(smjRows == defRows && smjRows.nonEmpty)
    }
  }

  test("h03's selective filters inject a runtime bloom filter into the " +
      "fact scan at cluster-scale thresholds") {
    // at 100 TB the orders date filter should cut the lineitem scan via
    // Spark's InjectRuntimeFilter (a bloom built from the filtered keys,
    // pushed into the probe side). The rule only fires past size
    // thresholds the bench SFs never reach (application side ≥ 10 GB),
    // so this gate reproduces the cluster-scale planner state: broadcast
    // off (SMJ, like a real fact join) and the scan-size floor lowered —
    // then the optimized plan MUST contain the bloom filter, and results
    // must be unchanged by it.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val df = SparkEntry.queries("h03_shipping_priority")(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloom"),
        s"no runtime bloom filter in the cluster-scale plan:\n$plan")
      val filteredRows = df.collect().map(_.toSeq).toSet
      val defaultRows = SparkEntry.queries("h03_shipping_priority")(spark, sfDir)
        .collect().map(_.toSeq).toSet
      assert(filteredRows == defaultRows && filteredRows.nonEmpty)
    }
  }

  test("runtime bloom filtering stays enabled in the session defaults") {
    assert(spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.enabled").toBoolean)
  }

  test("AQE skew-join handling stays enabled in the session defaults") {
    // at 100 TB a hot orderkey is split by AQE's skew-join rule; the
    // sessions this library builds must not have turned it off
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled").toBoolean)
  }

  test("AQE actually SPLITS a hot-orderkey partition on the fact-fact " +
      "SMJ path (skew=true in the final plan)") {
    import org.apache.spark.sql.functions._
    // q26's scale story leans on OptimizeSkewedJoin; enabled != fires, so
    // reproduce the cluster-scale state at test size: a fact-fact SMJ
    // (broadcast off) over a fixture where HALF of one side lands on a
    // single orderkey, with the skew thresholds scaled down to the
    // fixture's shuffle bytes. The finalized adaptive plan must mark the
    // join skew=true (the hot partition was split), and the result must
    // match the unsplit join.
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      def fixture = {
        val hotSide = spark.range(0, 40000).select(
          when(col("id") % 2 === 0, lit(1L)).otherwise(col("id"))
            .as("l_orderkey"),
          col("id").as("qty"))
        val otherSide = spark.range(0, 8000).select(
          (col("id") % 2000).as("l_orderkey"), col("id").as("price"))
        hotSide.join(otherSide, "l_orderkey")
      }
      val df = fixture
      val rows = df.collect() // finalize the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot partition:\n$plan")
      // correctness unchanged by the split
      val defaultRows = withConf(
        "spark.sql.adaptive.skewJoin.enabled" -> "false") {
        fixture.collect()
      }
      assert(rows.map(_.toSeq).sorted(Ordering.by((s: Seq[Any]) =>
          s.mkString(","))).toSeq ==
        defaultRows.map(_.toSeq).sorted(Ordering.by((s: Seq[Any]) =>
          s.mkString(","))).toSeq)
      assert(rows.nonEmpty)
    }
  }
}
