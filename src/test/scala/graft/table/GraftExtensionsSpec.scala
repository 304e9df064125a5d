package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Config-based extension injection: a session built with
  * `spark.sql.extensions=graft.table.GraftExtensions` gets SQL time travel
  * and cosine_sim without any runtime registration call.
  */
class GraftExtensionsSpec extends SparkSpecBase {

  test("extensions session: SQL time travel + cosine_sim via injected extensions") {
    // same SparkContext, new session with extensions applied.
    // withExtensions, not .config("spark.sql.extensions", ...): Spark reads
    // that config from the SparkContext's conf at FIRST context creation,
    // so on a shared test context it would be silently ignored.
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .create();
    // NOTE: never s.stop() here — it would stop the SparkContext shared
    // with every other suite; an extra session object is cheap.
    locally {
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false)))
      val dir = tmpDir("graft-ext")
      val t = GraftTable.create(s"$dir/t", schema)
      def df(ids: Long*) = s.createDataFrame(
        s.sparkContext.parallelize(ids.map(Row(_)), 1), schema)
      t.append(df(1L), Some(1000L))
      t.append(df(2L), Some(2000L))

      // view over the deferred relation WITHOUT GraftCatalog.register's
      // runtime rule injection — the config-injected rule must resolve it
      GraftRelation.dataFrame(s, t).createOrReplaceTempView("ext_t")
      assert(s.sql("SELECT * FROM ext_t").count() == 2)
      val tt = s.sql("SELECT id FROM ext_t WHERE snapshot__id = 1")
        .collect().map(_.getLong(0)).toSeq
      assert(tt == Seq(1L))

      // cosine_sim registered by the extension
      val c = s.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(c - 1.0) < 1e-15)

      // zorder_key registered too; matches the direct interleave
      val z = s.sql("SELECT zorder_key(1024L, 2048L) AS z")
        .collect()(0).getLong(0)
      assert(z == graft.functions.ZOrderKey.interleave(Array(1024L, 2048L)))

      // dot_product registered too
      val dp = s.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(dp == 11.0)

      // tokens registered too — the shared text-pipeline tokenizer
      val tk = s.sql("SELECT tokens('  Hello   WORLD  ') AS t")
        .collect()(0).getSeq[String](0)
      assert(tk == Seq("hello", "world"))
    }
  }
}
