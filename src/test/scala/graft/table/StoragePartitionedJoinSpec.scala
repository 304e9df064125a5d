package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Storage-partitioned joins: two graft tables bucketed the same way on
  * the join key join with NO shuffle on either side — the DSv2 scan
  * reports `KeyGroupedPartitioning(bucket(n, col))`, the catalog's
  * `bucket` function proves the layouts match, and Spark lines the
  * per-bucket partitions up directly. */
class StoragePartitionedJoinSpec extends SparkSpecBase {

  private val custSchema = StructType(Seq(
    StructField("ckey", LongType, nullable = false),
    StructField("seg", StringType, nullable = true)))
  private val ordSchema = StructType(Seq(
    StructField("okey", LongType, nullable = false),
    StructField("cust", LongType, nullable = false),
    StructField("amount", LongType, nullable = false)))

  private lazy val wh = tmpDir("graft-spj")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.g3", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.g3.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")

    val cust = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 40L).map(i => Row(i, s"seg${i % 3}")), 4), custSchema)
    val ords = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 400L).map(i => Row(i, i % 37 + 1, i * 7)), 4), ordSchema)
    GraftTable.create(s"$wh/db/cust_b", custSchema,
      partitionBy = Seq("bucket(8,ckey)")).append(cust, Some(1000L))
    GraftTable.create(s"$wh/db/ords_b", ordSchema,
      partitionBy = Seq("bucket(8,cust)")).append(ords, Some(1000L))
  }

  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val rest = plan match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        allNodes(r.child)
      case other => other.children.flatMap(allNodes)
    }
    plan +: rest
  }

  private def keyed(name: String): DataFrame =
    spark.read.option("key-grouped", "true").table(name)

  test("co-bucketed join on the bucket key plans zero shuffles") {
    val j = keyed("g3.db.cust_b").join(keyed("g3.db.ords_b"),
      col("ckey") === col("cust"))
    val rows = j.collect()
    // parity against a plain (shuffled) join of the same tables
    val plain = spark.read.table("g3.db.cust_b").join(
      spark.read.table("g3.db.ords_b"), col("ckey") === col("cust"))
    assert(rows.length == plain.count(),
      s"SPJ parity broken: ${rows.length} vs ${plain.count()}")
    assert(rows.length == 400, s"expected every order matched, got ${rows.length}")

    val nodes = allNodes(j.queryExecution.executedPlan)
    assert(nodes.exists(n => n.isInstanceOf[SortMergeJoinExec] ||
      n.isInstanceOf[ShuffledHashJoinExec]),
      s"expected a partitioned join:\n${nodes.map(_.nodeName).mkString("\n")}")
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"storage-partitioned join still shuffled:\n${nodes.map(_.nodeName).mkString("\n")}")
  }

  test("the grouped scan returns the same rows as the plain scan") {
    val a = keyed("g3.db.ords_b").collect().map(_.toSeq).toSet
    val b = spark.read.table("g3.db.ords_b").collect().map(_.toSeq).toSet
    assert(a == b)
    // and predicates still prune + answer correctly through the wrapper
    val f = keyed("g3.db.ords_b").filter(col("cust") === 7L)
    assert(f.collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 400L).filter(i => i % 37 + 1 == 7).sorted)
  }

  test("without the option the scan keeps bin-packed splits and shuffles") {
    val j = spark.read.table("g3.db.cust_b").join(
      spark.read.table("g3.db.ords_b"), col("ckey") === col("cust"))
    j.collect()
    val nodes = allNodes(j.queryExecution.executedPlan)
    // no key-grouped report -> Spark must move data (shuffle or broadcast)
    assert(nodes.exists(n => n.isInstanceOf[ShuffleExchangeExec] ||
      n.nodeName.toLowerCase.contains("broadcast")),
      s"plain join unexpectedly co-located:\n${nodes.map(_.nodeName).mkString("\n")}")
  }

  test("one side missing buckets still joins shuffle-free (pushed values)") {
    // sparse table: only a handful of keys -> some of the 8 buckets empty
    val sparse = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 3L).map(i => Row(i, s"s$i")), 1),
      custSchema)
    GraftTable.create(s"$wh/db/sparse_b", custSchema,
      partitionBy = Seq("bucket(8,ckey)")).append(sparse, Some(1000L))
    val j = keyed("g3.db.sparse_b").join(keyed("g3.db.ords_b"),
      col("ckey") === col("cust"))
    val n = j.count()
    val expect = (1L to 400L).count(i => i % 37 + 1 <= 3)
    assert(n == expect, s"sparse SPJ lost rows: $n vs $expect")
    val nodes = allNodes(j.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"sparse-side SPJ shuffled:\n${nodes.map(_.nodeName).mkString("\n")}")
  }

  test("spec-evolved tables never report key-grouping") {
    val t = GraftTable.create(s"$wh/db/evo_b", custSchema,
      partitionBy = Seq("bucket(4,ckey)"))
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 10L).map(i => Row(i, "x")), 1),
      custSchema), Some(1000L))
    val evolved = t.updatePartitionSpec(Seq("bucket(8,ckey)"))
    evolved.append(spark.createDataFrame(
      spark.sparkContext.parallelize((11L to 20L).map(i => Row(i, "y")), 1),
      custSchema), Some(2000L))
    // the read must fall back (two eras' bucket ids are incomparable):
    // correct rows, and a join against it shuffles like a plain read
    val j = keyed("g3.db.evo_b").join(keyed("g3.db.ords_b"),
      col("ckey") === col("cust"))
    j.collect()
    val nodes = allNodes(j.queryExecution.executedPlan)
    assert(nodes.exists(n => n.isInstanceOf[ShuffleExchangeExec] ||
      n.nodeName.toLowerCase.contains("broadcast")),
      "evolved table reported key-grouping across spec eras")
    assert(keyed("g3.db.evo_b").count() == 20)
  }

  test("SQL joins opt in through the table property") {
    // pure-SQL surface: no read options exist there, so the property is
    // the opt-in — both tables marked key-grouped, SQL join co-locates
    val p = Map("graft.read.key-grouped" -> "true")
    GraftTable.create(s"$wh/db/cust_p", custSchema, properties = p,
      partitionBy = Seq("bucket(8,ckey)")).append(
      spark.createDataFrame(
        spark.sparkContext.parallelize((1L to 40L).map(i => Row(i, s"s$i")), 2),
        custSchema), Some(1000L))
    GraftTable.create(s"$wh/db/ords_p", ordSchema, properties = p,
      partitionBy = Seq("bucket(8,cust)")).append(
      spark.createDataFrame(
        spark.sparkContext.parallelize((1L to 400L).map(i => Row(i, i % 40 + 1, i)), 2),
        ordSchema), Some(1000L))
    val j = spark.sql(
      "SELECT seg, count(*) AS n FROM g3.db.cust_p c " +
        "JOIN g3.db.ords_p o ON c.ckey = o.cust GROUP BY seg")
    assert(j.collect().map(_.getLong(1)).sum == 400)
    val nodes = allNodes(j.queryExecution.executedPlan)
    val joins = nodes.filter(n => n.isInstanceOf[SortMergeJoinExec] ||
      n.isInstanceOf[ShuffledHashJoinExec])
    assert(joins.nonEmpty, "expected a partitioned join in the SQL plan")
    // the join itself is shuffle-free; the GROUP BY above it may shuffle
    val underJoin = joins.flatMap(allNodes)
    assert(!underJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"property-gated SQL SPJ shuffled:\n${nodes.map(_.nodeName).mkString("\n")}")
  }

  test("one un-bucketed side re-buckets through the catalog function") {
    // storage-partitioned SHUFFLE: with v2.bucketing.shuffle enabled the
    // plain side is hashed by the CATALOG's bucket function (evaluated
    // via produceResult) into the table's layout — only that side moves
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // kill broadcast so the planner must move rows: the SMJ/SHJ shape
    // with exactly ONE exchange proves the plain side was hashed into
    // the table's layout by the catalog function, not vice versa
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = spark.createDataFrame(
        spark.sparkContext.parallelize(
          (1L to 200L).map(i => Row(i, i % 37 + 1, i * 3)), 4), ordSchema)
      val j = keyed("g3.db.cust_b").join(plain, col("ckey") === col("cust"))
      val rows = j.collect()
      assert(rows.length == 200, s"re-bucketed join lost rows: ${rows.length}")
      val nodes = allNodes(j.queryExecution.executedPlan)
      assert(nodes.exists(n => n.isInstanceOf[SortMergeJoinExec] ||
        n.isInstanceOf[ShuffledHashJoinExec]),
        s"expected a partitioned join:\n${nodes.map(_.nodeName).mkString("\n")}")
      val shuffles = nodes.filter(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles.size == 1,
        s"expected exactly the plain side to shuffle, got ${shuffles.size}:\n" +
          nodes.map(_.nodeName).mkString("\n"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "false")
    }
  }

  test("the catalog bucket function matches the write-side derivation") {
    // the function the join-compatibility proof binds must place every
    // value in the directory the writer chose
    import org.apache.spark.sql.catalyst.InternalRow
    val f = GraftV2Functions.load("bucket").get
      .bind(StructType(Seq(
        StructField("n", IntegerType), StructField("v", LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    val fromDf = spark.range(1, 200)
      .select(col("id"), pmod(xxhash64(col("id")), lit(8L)).cast("int").as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (1L until 200L).foreach { v =>
      assert(f.produceResult(InternalRow(8, v)) == fromDf(v),
        s"bucket($v) diverged from the write expression")
    }
  }
}
