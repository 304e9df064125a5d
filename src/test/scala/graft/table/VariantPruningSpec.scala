package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** MANIFEST-LEVEL file pruning on VARIANT paths (shredded-stat harvest
  * + VariantPruning's predicate rewrite): files whose shredded
  * `typed_value` bounds rule a `variant_get` predicate out are skipped
  * at planning time; every deviation from the clean shred shape —
  * type-mixed rows (fallback non-null), missing keys, narrowing casts,
  * exotic types — keeps the file conservatively. The property sweep is
  * the soundness contract: keep-set ⊇ matching files, always. */
class VariantPruningSpec extends SparkSpecBase {

  private def varDf(jsons: Seq[String]): DataFrame = {
    import spark.implicits._
    jsons.zipWithIndex.map { case (j, i) => (i.toLong, j) }
      .toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("meta"))
      .repartition(1)
  }

  private def mkTable(dir: String, batches: Seq[Seq[String]]): GraftTable = {
    val t0 = GraftTable.create(s"$dir/t", varDf(Seq("""{"k":1}""")).schema)
    batches.zipWithIndex.foreach { case (b, i) =>
      t0.append(varDf(b), committedAt = Some(1000L + i))
    }
    GraftTable.load(s"$dir/t")
  }

  private def kept(t: GraftTable, pred: org.apache.spark.sql.Column): Seq[String] = {
    val resolved = GraftTable.resolveAgainst(spark, t.schema,
      org.apache.spark.sql.classic.GraftBridge.expr(pred))
    val manifest = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    t.prunedFiles(manifest, resolved).map(_.path).sorted
  }

  private def allFiles(t: GraftTable): Seq[String] =
    Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
      .files.map(_.path).sorted

  test("disjoint shredded ranges prune to one file; results stay exact") {
    val dir = tmpDir("vp_ranges")
    val t = mkTable(dir, Seq(
      (1 to 50).map(i => s"""{"k": $i, "tag": "a$i"}"""),
      (101 to 150).map(i => s"""{"k": $i, "tag": "b$i"}"""),
      (201 to 250).map(i => s"""{"k": $i, "tag": "c$i"}""")))
    assert(allFiles(t).size == 3)
    // harvested pseudo keys present with exact bounds
    val st = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
      .files.flatMap(_.stats.get(VariantPruning.statKey("meta", "$.k", "long")))
    assert(st.size == 3 && st.forall(s => s.min.isDefined && s.max.isDefined))
    // point probe → one file
    assert(kept(t, variant_get(col("meta"), "$.k", "int") === 120).size == 1)
    // range probe → one file
    assert(kept(t, variant_get(col("meta"), "$.k", "bigint") > 200L).size == 1)
    // string path prunes too
    assert(kept(t,
      variant_get(col("meta"), "$.tag", "string") === "b120").size == 1)
    // no-match probe → zero files
    assert(kept(t, variant_get(col("meta"), "$.k", "int") === 99).isEmpty)
    // and the full read still answers exactly through the residual filter
    assert(t.read(spark)
      .filter(variant_get(col("meta"), "$.k", "int") === 120)
      .count() == 1L)
  }

  test("type-mixed rows poison the key: the file is always kept") {
    val dir = tmpDir("vp_mixed")
    val t = mkTable(dir, Seq(
      (1 to 20).map(i => s"""{"k": $i}"""),
      // one string-typed k routes to the fallback value column
      (101 to 119).map(i => s"""{"k": $i}""") :+ """{"k": "oops"}"""))
    val key = VariantPruning.statKey("meta", "$.k", "long")
    val files = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}").files
    assert(files.count(_.stats.contains(key)) <= 1,
      "the mixed file must not carry the pseudo key")
    // probe that rules out the clean file still keeps the mixed one
    val k = kept(t, variant_get(col("meta"), "$.k", "int") === 999)
    assert(k.size >= 1 && files.filterNot(_.stats.contains(key))
      .map(_.path).forall(k.contains), s"mixed file pruned unsoundly: $k")
  }

  test("missing keys and nested paths: conservative where unharvested, exact where clean") {
    val dir = tmpDir("vp_missing")
    val t = mkTable(dir, Seq(
      (1 to 20).map(i => s"""{"other": $i}"""),          // no k anywhere
      (1 to 20).map(i => s"""{"k": $i, "nested": {"x": ${i * 10}}}""")))
    // file without the key has no pseudo stats → kept on any k probe
    val k = kept(t, variant_get(col("meta"), "$.k", "int") === 999)
    assert(k.size == 1, s"missing-key file must stay kept: $k")
    // nested long path prunes the clean file when out of bounds
    val n = kept(t, variant_get(col("meta"), "$.nested.x", "bigint") > 500L)
    assert(n.size == 1, s"nested probe should keep only the no-key file: $n")
    assert(kept(t,
      variant_get(col("meta"), "$.nested.x", "bigint") === 50L).size == 2)
    // double probes never prune (the engine refuses float compares —
    // NaN-safety) but stay correct
    assert(kept(t,
      variant_get(col("meta"), "$.nested.x", "double") > 1e9).size == 2)
  }

  test("narrowing casts stay conservative; NOT/IS NULL respect null counts") {
    val dir = tmpDir("vp_casts")
    val big = 4000000000L // > Int.MaxValue
    val t = mkTable(dir, Seq(
      Seq(s"""{"k": $big}""", s"""{"k": ${big + 1}}"""),
      (1 to 10).map(i => s"""{"k": $i}""") :+ """{"other": 1}"""))
    // int probe against long-out-of-range bounds: range guard → kept
    assert(kept(t, variant_get(col("meta"), "$.k", "int") === 5).size == 2)
    // long probe CAN prune the big file out
    assert(kept(t, variant_get(col("meta"), "$.k", "bigint") === 5L).size == 1)
    // file 2 has a missing-k row (null extraction): NOT(k=5) must keep
    // it even though 1..10 spans 5 (NULL rows fail the NOT too — but
    // non-5 rows match; the point is it is NOT skipped)
    assert(kept(t,
      !(variant_get(col("meta"), "$.k", "bigint") === 5L)).size == 2)
    // IS NULL keeps exactly the file with a null extraction…
    val isNull = kept(t, variant_get(col("meta"), "$.k", "bigint").isNull)
    assert(isNull.size >= 1)
    // …and IS NOT NULL keeps both (both hold non-null extractions)
    assert(kept(t,
      variant_get(col("meta"), "$.k", "bigint").isNotNull).size == 2)
  }

  test("segment envelopes carry variant keys: point probes skip whole segments") {
    val dir = tmpDir("vp_envelope")
    val t = mkTable(dir, Seq(
      (1 to 50).map(i => s"""{"k": $i}"""),
      (101 to 150).map(i => s"""{"k": $i}"""),
      (201 to 250).map(i => s"""{"k": $i}""")))
    val m = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    val key = VariantPruning.statKey("meta", "$.k", "long")
    // each append's segment envelope carries the merged variant bounds
    assert(m.segments.size == 3)
    assert(m.segments.forall(_.envelope.exists(e =>
      e.get(key).exists(st => st.min.isDefined && st.max.isDefined))),
      "segment envelopes must type and merge the variant pseudo key")
    // a point probe plans through the envelopes: only the matching
    // segment's entries are kept — and only it needs parsing (the lazy
    // planning discipline at 10⁶ files, now for variant predicates)
    val before = m.segmentRefs.filter(r =>
      Manifest.parsedSegmentPaths.contains(s"${t.dir}/$r")).toSet
    val kept120 = kept(t, variant_get(col("meta"), "$.k", "int") === 120)
    assert(kept120.size == 1)
    val parsedNow = m.segmentRefs.filter(r =>
      Manifest.parsedSegmentPaths.contains(s"${t.dir}/$r")).toSet -- before
    assert(parsedNow.size <= 1,
      s"variant point probe parsed ${parsedNow.size} of 3 segments")
    // a probe outside every range keeps nothing and parses nothing new
    assert(kept(t, variant_get(col("meta"), "$.k", "int") === 999).isEmpty)
  }

  test("property sweep: keep-set always covers matching files") {
    val rnd = new scala.util.Random(20260816L)
    val dir = tmpDir("vp_sweep")
    // 6 files of mixed-shape docs: long k (occasionally ABOVE int
    // range, alongside small values in the same batch — the
    // half-parseable-bound shape: min parses as int, max does not),
    // string k, missing k, nested
    val batches: Seq[Seq[String]] = (0 until 6).map { b =>
      (0 until 30).map { _ =>
        rnd.nextInt(5) match {
          case 0 => s"""{"k": ${rnd.nextInt(1000) - 500}}"""
          case 1 =>
            if (rnd.nextInt(4) == 0)
              s"""{"k": ${Int.MaxValue.toLong + 1 + rnd.nextInt(1000)}}"""
            else s"""{"k": ${rnd.nextInt(100000)}}"""
          case 2 => s"""{"k": "s${rnd.nextInt(100)}"}"""
          case 3 => s"""{"other": ${rnd.nextInt(10)}}"""
          case _ => s"""{"k": ${rnd.nextInt(50)}, "n": {"x": ${rnd.nextInt(100)}.25}}"""
        }
      }
    }
    val t = mkTable(dir, batches)
    val files = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
      .files
    assert(files.size == 6)
    def bn(p: String) = p.substring(p.lastIndexOf('/') + 1)
    // per-file truth via a per-file read; a file where evaluation
    // THROWS (failOnError cast on a type-mixed row) must be KEPT too —
    // skipping it would silently suppress the query's own error
    def matching(pred: org.apache.spark.sql.Column): Set[String] =
      files.filter { f =>
        try spark.read.schema(t.schema)
          .parquet(java.nio.file.Paths.get(t.dir, f.path).toString)
          .filter(pred).limit(1).count() > 0
        catch { case _: Throwable => true }
      }.map(f => bn(f.path)).toSet
    val probes: Seq[org.apache.spark.sql.Column] = (0 until 60).map { _ =>
      val v = rnd.nextInt(1200) - 600
      val c =
        if (rnd.nextInt(4) == 0)
          try_variant_get(col("meta"), "$.k",
            if (rnd.nextBoolean()) "int" else "bigint")
        else variant_get(col("meta"), "$.k",
          if (rnd.nextBoolean()) "int" else "bigint")
      rnd.nextInt(6) match {
        case 0 => c === v
        case 1 => c > v
        case 2 => c <= v
        case 3 => !(c === v)
        case 4 => c.isNull
        case _ => variant_get(col("meta"), "$.n.x", "double") > (v / 4.0)
      }
    }
    probes.foreach { p =>
      val keptBns = kept(t, p).map(bn).toSet
      val mustKeep = matching(p)
      assert(mustKeep.subsetOf(keptBns),
        s"UNSOUND variant prune for $p: dropped ${mustKeep -- keptBns}")
    }
  }

  test("half-parseable bounds never skip a file that would THROW (int range guard)") {
    val dir = tmpDir("vp_guard")
    // min parses as int (10), max (6e9) does not — the file holds a
    // value whose failOnError int extraction throws, so a `= 5` probe
    // must KEEP it even though no row can match
    val t = mkTable(dir, Seq(
      Seq("""{"k": 10}""", """{"k": 6000000000}"""),
      (200 to 220).map(i => s"""{"k": $i}""")))
    val throwing = kept(t, variant_get(col("meta"), "$.k", "int") === 5)
    assert(throwing.size == 1, s"mixed-range file must stay kept: $throwing")
    // and the kept file is the one that throws at runtime
    assertThrows[Exception] {
      t.read(spark).filter(variant_get(col("meta"), "$.k", "int") === 5).count()
    }
    // try_variant_get never throws: out-of-range rows extract NULL, so
    // the same probe soundly prunes BOTH files (no 5 anywhere)
    assert(kept(t, try_variant_get(col("meta"), "$.k", "int") === 5).isEmpty)
    assert(t.read(spark)
      .filter(try_variant_get(col("meta"), "$.k", "int") === 5).count() == 0L)
    // IS NULL under try: out-of-range rows ARE null at runtime even
    // though the stored null count is zero — the guard keeps the file
    val nulls = kept(t, try_variant_get(col("meta"), "$.k", "int").isNull)
    assert(nulls.size == 1, s"guard must keep the out-of-range file: $nulls")
    assert(t.read(spark)
      .filter(try_variant_get(col("meta"), "$.k", "int").isNull).count() == 1L)
    // ordering probes guard too: `< 100` matches k=10 in the mixed
    // file; `> 300` matches nothing in-range but the mixed file could
    // still throw → kept
    assert(kept(t, variant_get(col("meta"), "$.k", "int") < 100).size == 1)
    val gt = kept(t, variant_get(col("meta"), "$.k", "int") > 300)
    assert(gt.size == 1, s"throw-capable file must survive > probe: $gt")
  }

  test("decimal family: slack-bounded pruning, rounding and overflow stay sound") {
    val dir = tmpDir("vp_dec")
    val t = mkTable(dir, Seq(
      (1 to 40).map(i => s"""{"price": ${i}.25}"""),
      (1 to 40).map(i => s"""{"price": ${i + 1000}.25}""")))
    val key = VariantPruning.statKey("meta", "$.price", "dec")
    val files = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}").files
    // decimal-annotated shredded leaves harvest under the dec fam
    assume(files.forall(_.stats.contains(key)),
      "shred shape did not produce decimal typed_value on this Spark")
    // exact-scale point probe prunes to one file
    assert(kept(t, variant_get(col("meta"), "$.price", "decimal(9,2)")
      === lit(BigDecimal("1005.25"))).size == 1)
    // SCALE-NARROWING probe rounds at runtime: decimal(9,1) of 3.25 is
    // 3.3 (half-up) — a 3.3 probe must keep the low file (slack)
    val rounded = kept(t, variant_get(col("meta"), "$.price", "decimal(9,1)")
      === lit(BigDecimal("3.3")))
    assert(rounded.size == 1, s"rounding slack must keep the low file: $rounded")
    assert(t.read(spark).filter(
      variant_get(col("meta"), "$.price", "decimal(9,1)")
        === lit(BigDecimal("3.3"))).count() == 1L)
    // OVERFLOW-capable request: decimal(3,2) cannot hold 1001.25 —
    // the high file throws at runtime and must be kept by any probe
    val tight = kept(t, variant_get(col("meta"), "$.price", "decimal(3,2)")
      === lit(BigDecimal("1.25")))
    assert(tight.size == 2, s"overflow guard must keep the high file: $tight")
    // range probes prune with slack
    assert(kept(t, variant_get(col("meta"), "$.price", "decimal(9,2)")
      > lit(BigDecimal("500.00"))).size == 1)
    // SUB-1 literal: BigDecimal("0.05") has precision 1 < scale 2 — the
    // slack/guard literals (0.04/0.06) must not crash DecimalType
    // construction, and no file holds a sub-1 price → both prune
    assert(kept(t, variant_get(col("meta"), "$.price", "decimal(9,2)")
      === lit(BigDecimal("0.05"))).isEmpty)
    assert(t.read(spark).filter(
      variant_get(col("meta"), "$.price", "decimal(9,2)")
        === lit(BigDecimal("0.05"))).count() == 0L)
  }

  test("date/timestamp/boolean families prune exactly") {
    import spark.implicits._
    val dir = tmpDir("vp_dtb")
    def batch(off: Int, flag: Boolean): DataFrame =
      (0 until 20).map(i => (i.toLong + off * 100, off * 30 + i, flag))
        .toDF("id", "d", "f")
        .select(col("id"), to_variant_object(struct(
          date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("d")).as("day"),
          timestamp_seconds(lit(1700000000L) + col("d") * 86400).as("at"),
          col("f").as("flag"))).as("meta"))
        .repartition(1)
    val t0 = GraftTable.create(s"$dir/t", batch(0, flag = true).schema)
    t0.append(batch(0, flag = true), committedAt = Some(1000L))
    t0.append(batch(10, flag = false), committedAt = Some(1001L))
    val t = GraftTable.load(s"$dir/t")
    val files = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}").files
    val dateKey = VariantPruning.statKey("meta", "$.day", "date")
    assume(files.forall(_.stats.contains(dateKey)),
      "shred shape did not produce date typed_value on this Spark")
    // date point probe → one file
    val dp = kept(t, variant_get(col("meta"), "$.day", "date")
      === lit(java.sql.Date.valueOf("2024-01-05")))
    assert(dp.size == 1, s"date probe: $dp")
    assert(t.read(spark).filter(variant_get(col("meta"), "$.day", "date")
      === lit(java.sql.Date.valueOf("2024-01-05"))).count() == 1L)
    // timestamp range probe — second batch only
    val cut = new java.sql.Timestamp((1700000000L + 305L * 86400) * 1000L)
    val tp = kept(t, variant_get(col("meta"), "$.at", "timestamp") > lit(cut))
    assert(tp.size == 1, s"timestamp probe: $tp")
    // boolean probe — flag=false only in the second file
    val bp = kept(t, variant_get(col("meta"), "$.flag", "boolean") === lit(false))
    assert(bp.size == 1, s"boolean probe: $bp")
    assert(t.read(spark).filter(
      variant_get(col("meta"), "$.flag", "boolean") === lit(false)).count() == 20L)
  }
}
