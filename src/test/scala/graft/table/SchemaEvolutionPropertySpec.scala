package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Model-based property sweep for the schema-evolution era machinery:
  * random chains of append / rename / widen / drop / add / CoW delete /
  * compaction, with an in-memory model of the logical table maintained in
  * parallel. After EVERY op the real read must equal the model exactly —
  * values, names, types, and null-fills — across all era combinations
  * the chain produced. This is the combinatorial net under
  * [[GraftTable.physicalField]]'s merged newest→oldest event walk, which
  * the unit tests only sample. */
class SchemaEvolutionPropertySpec extends SparkSpecBase {

  test("random evolution chains read exactly like the model") {
    val rnd = new scala.util.Random(sys.env.getOrElse("GRAFT_FUZZ_SEED", "11").toLong)

    for (trial <- 1 to 5) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-evoprop$trial").toString
      // live schema state: ordered (name, type); id never evolves (the
      // stable row handle the model keys on)
      var cols = Vector[(String, DataType)](
        "id" -> LongType, "v" -> IntegerType, "s" -> StringType)
      var t = GraftTable.create(s"$dir/t",
        StructType(cols.map { case (n, d) => StructField(n, d, nullable = true) }))
      var model = Vector.empty[Map[String, Any]]
      var nextId = 0L
      var nameSeq = 0
      var ts = 1000L

      def freshName(): String = { nameSeq += 1; s"c$nameSeq" }

      def sparkSchema = StructType(
        cols.map { case (n, d) => StructField(n, d, nullable = true) })

      def randomValue(dt: DataType): Any = dt match {
        case LongType => rnd.nextInt(50).toLong
        case IntegerType => rnd.nextInt(50)
        case DoubleType => rnd.nextInt(10) + 0.5
        case FloatType => rnd.nextInt(10) + 0.5f
        case StringType => s"w${rnd.nextInt(8)}"
        case _ => null
      }

      def appendRows(n: Int): Unit = {
        val rows = (1 to n).map { _ =>
          nextId += 1
          cols.map { case (name, dt) =>
            name -> (if (name == "id") nextId else randomValue(dt))
          }.toMap
        }
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(
            rows.map(r => Row(cols.map { case (n, _) => r(n) }: _*)), 1),
          sparkSchema)
        ts += 1000L
        t.append(df, Some(ts))
        model ++= rows
      }

      def check(step: String): Unit = {
        val got = t.read(spark).drop("snapshot__id").collect().map { r =>
          cols.map { case (n, _) =>
            n -> (if (r.isNullAt(r.fieldIndex(n))) null else r.get(r.fieldIndex(n)))
          }.toMap
        }.toVector
        def canon(rows: Vector[Map[String, Any]]) =
          rows.sortBy(_.apply("id").asInstanceOf[Long])
        assert(canon(got) == canon(model),
          s"trial $trial after $step:\n got  ${canon(got)}\n want ${canon(model)}")
      }

      appendRows(3)
      check("seed")

      for (step <- 1 to 8) {
        val evolvable = cols.filter(_._1 != "id")
        val widenable = evolvable.filter { case (_, d) =>
          d == IntegerType || d == FloatType }
        val ops = Seq.newBuilder[String]
        ops += "append"
        ops += "compact"
        if (evolvable.nonEmpty) { ops += "rename"; ops += "delete" }
        if (evolvable.size > 1) ops += "drop"
        if (widenable.nonEmpty) ops += "widen"
        if (cols.size < 6) ops += "add"
        val all = ops.result()
        val op = all(rnd.nextInt(all.size))
        op match {
          case "append" => appendRows(1 + rnd.nextInt(2))
          case "compact" =>
            ts += 1000L
            t.compact(spark, smallerThanBytes = Long.MaxValue, Some(ts))
          case "rename" =>
            val (from, _) = evolvable(rnd.nextInt(evolvable.size))
            val to = freshName()
            t = t.renameColumn(from, to)
            cols = cols.map { case (n, d) => (if (n == from) to else n, d) }
            model = model.map(r => (r - from) + (to -> r(from)))
          case "widen" =>
            val (c, d) = widenable(rnd.nextInt(widenable.size))
            val to = if (d == IntegerType) LongType else DoubleType
            t = t.widenColumn(c, to)
            cols = cols.map { case (n, dd) => (n, if (n == c) to else dd) }
            model = model.map { r =>
              r + (c -> (r(c) match {
                case null => null
                case i: Int => i.toLong
                case f: Float => f.toDouble
                case other => other
              }))
            }
          case "drop" =>
            val (c, _) = evolvable(rnd.nextInt(evolvable.size))
            t = t.dropColumn(c)
            cols = cols.filterNot(_._1 == c)
            model = model.map(_ - c)
          case "add" =>
            val c = freshName()
            val d = Seq(LongType, StringType, IntegerType)(rnd.nextInt(3))
            t = t.addColumn(c, d)
            cols = cols :+ (c -> d)
            model = model.map(_ + (c -> null))
          case "delete" =>
            // CoW delete on a random existing value of a random column
            val (c, _) = evolvable(rnd.nextInt(evolvable.size))
            val vals = model.map(_.apply(c)).filter(_ != null).distinct
            if (vals.nonEmpty) {
              val v = vals(rnd.nextInt(vals.size))
              ts += 1000L
              t.delete(spark, col(c) === lit(v), Some(ts))
              model = model.filterNot(r => r(c) == v)
            }
        }
        check(s"step $step ($op)")
      }
      GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
