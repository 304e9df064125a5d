package graft.table

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Property sweep for metadata-answered aggregates: over random tables
  * (nulls, all-null files, multiple snapshots, optional identity
  * partitioning), every aggregate the DSv2 path answers from the
  * manifest must equal the same aggregate computed by actually scanning
  * the rows. Seeded; override with GRAFT_FUZZ_SEED. */
class AggPushdownPropertySpec extends SparkSpecBase {

  private val seed =
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260814L)

  private lazy val wh = tmpDir("graft-aggprop")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.g9", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.g9.warehouse", wh)
  }

  private val schema = StructType(Seq(
    StructField("lv", LongType, nullable = true),
    StructField("iv", IntegerType, nullable = true),
    StructField("dv", DecimalType(10, 2), nullable = true),
    StructField("dt", DateType, nullable = true),
    StructField("part", StringType, nullable = true)))

  private def randomRows(rnd: Random, n: Int): Seq[Row] = {
    // occasionally an all-null column for the whole batch (exercises
    // the contributes-nothing path)
    val lvAllNull = rnd.nextInt(5) == 0
    val dvAllNull = rnd.nextInt(5) == 0
    (0 until n).map { _ =>
      def opt[A](v: => A): Any =
        if (rnd.nextInt(4) == 0) null else v.asInstanceOf[Any]
      Row(
        if (lvAllNull) null else opt(rnd.nextLong() % 100000L),
        opt(rnd.nextInt(1000) - 500),
        if (dvAllNull) null
        else opt(new java.math.BigDecimal(rnd.nextInt(100000))
          .movePointLeft(2)),
        opt(java.sql.Date.valueOf(java.time.LocalDate
          .ofEpochDay(rnd.nextInt(20000).toLong))),
        if (rnd.nextInt(6) == 0) null else s"p${rnd.nextInt(3)}")
    }
  }

  test("pushed aggregates equal real-scan recomputes over random tables") {
    val rnd = new Random(seed)
    for (i <- 0 until 10) {
      val partitioned = rnd.nextBoolean()
      val name = s"pt$i"
      val tb = GraftTable.create(s"$wh/db/$name", schema,
        partitionBy = if (partitioned) Seq("part") else Nil)
      val snapshots = 1 + rnd.nextInt(3)
      for (s <- 0 until snapshots)
        tb.append(spark.createDataFrame(
          spark.sparkContext.parallelize(
            randomRows(rnd, 5 + rnd.nextInt(40)), 1 + rnd.nextInt(3)),
          schema), Some(1000L * (s + 1)))

      val aggs = "count(*) AS n, count(lv) AS nlv, min(lv) AS lo_lv, " +
        "max(lv) AS hi_lv, min(iv) AS lo_iv, max(iv) AS hi_iv, " +
        "min(dv) AS lo_dv, max(dv) AS hi_dv, min(dt) AS lo_dt, " +
        "max(dt) AS hi_dt"
      val pushed = spark.sql(s"SELECT $aggs FROM g9.db.$name")
        .collect().map(_.toSeq).toSeq
      tb.read(spark).createOrReplaceTempView(s"raw_$name")
      val real = spark.sql(s"SELECT $aggs FROM raw_$name")
        .collect().map(_.toSeq).toSeq
      assert(pushed == real,
        s"table $i (partitioned=$partitioned): pushed $pushed != $real")

      if (partitioned) {
        val g = s"SELECT part, $aggs FROM %s GROUP BY part ORDER BY part"
        val gp = spark.sql(g.format(s"g9.db.$name"))
          .collect().map(_.toSeq).toSeq
        val gr = spark.sql(g.format(s"raw_$name"))
          .collect().map(_.toSeq).toSeq
        assert(gp == gr,
          s"table $i grouped: pushed $gp != $gr")
      }

      // FILTERED aggregates: whether a conjunct gets CLAIMED (whole-file
      // proofs) or stays residual, the answer must equal the recompute —
      // this sweeps the claim decision end-to-end through real plans
      val filters = Seq(
        "part = 'p1'", "part IS NULL", "lv > 0", "iv <= 100",
        s"lv > ${rnd.nextLong() % 50000L}",
        "part = 'p0' AND iv > 0")
      for (w <- filters) {
        val f = s"SELECT $aggs FROM %s WHERE $w"
        val fp = spark.sql(f.format(s"g9.db.$name"))
          .collect().map(_.toSeq).toSeq
        val fr = spark.sql(f.format(s"raw_$name"))
          .collect().map(_.toSeq).toSeq
        assert(fp == fr,
          s"table $i WHERE $w: pushed $fp != $fr")
      }
    }
  }

  test("date-grouped pushed aggregates equal recomputes over time layouts") {
    val rnd = new Random(seed + 1)
    val tschema = StructType(Seq(
      StructField("ts", TimestampType, nullable = true),
      StructField("v", LongType, nullable = true)))
    for ((layout, i) <- Seq("days(ts)", "hours(ts)", "months(ts)").zipWithIndex) {
      val name = s"tt$i"
      val tb = GraftTable.create(s"$wh/db/$name", tschema,
        partitionBy = Seq(layout))
      val rows = (0 until 60).map { _ =>
        val ts =
          if (rnd.nextInt(8) == 0) null
          else java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(
            2026, 1 + rnd.nextInt(3), 1 + rnd.nextInt(5),
            rnd.nextInt(24), rnd.nextInt(60), 0))
        Row(ts, if (rnd.nextInt(5) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(1000).toLong))
      }
      tb.append(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), tschema), Some(1000L))
      tb.read(spark).createOrReplaceTempView(s"rawt_$name")
      // days/hours serve the cast grouping metadata-only; months must
      // fall back — either way the answer equals the recompute
      val q = "SELECT CAST(ts AS DATE) AS d, count(*) AS n, " +
        "count(v) AS nv, min(v) AS lo, max(v) AS hi FROM %s " +
        "GROUP BY 1 ORDER BY d NULLS FIRST"
      val gp = spark.sql(q.format(s"g9.db.$name")).collect().map(_.toSeq).toSeq
      val gr = spark.sql(q.format(s"rawt_$name")).collect().map(_.toSeq).toSeq
      assert(gp == gr, s"$layout date grouping: pushed $gp != $gr")
      // filtered + grouped compose
      val qf = "SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM %s " +
        "WHERE ts >= TIMESTAMP'2026-02-01 00:00:00' GROUP BY 1 ORDER BY d"
      val fp = spark.sql(qf.format(s"g9.db.$name")).collect().map(_.toSeq).toSeq
      val fr = spark.sql(qf.format(s"rawt_$name")).collect().map(_.toSeq).toSeq
      assert(fp == fr, s"$layout filtered grouping: pushed $fp != $fr")
    }
  }
}
