package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.queries.Dedup

/** The fused portable-shingle kernels must match the composed spelling
  * (`array_distinct(transform(kgrams, md5 → conv → % M31))` and
  * perms × `array_min(transform(sh, (h·a+b) % M31))`) value for value —
  * the st01 oracle hash and the stream/batch admission parity depend on
  * it, most directly the md5-prefix arithmetic
  * (`conv(substring(md5(s),1,15),16,10)` = top 60 digest bits). */
class PortableTextSpec extends SparkSpecBase {

  private val M31 = 2147483647L

  test("portable_shingles matches md5-conv hashing of kgrams, distinct, in order") {
    import spark.implicits._
    val df = Seq(
      (1L, "The  Quick   brown fox jumps"),
      (2L, "tiny doc"),
      (3L, ""),
      (4L, "a a a a a a") // duplicate grams: distinct must collapse them
    ).toDF("doc_id", "text")
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
      t => length(t) > 0)
    val got = df.select(col("doc_id"),
      PortableText.portable_shingles(toks, 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = df.select(col("doc_id"),
      array_distinct(transform(TextOps.kgrams(toks, 3),
        g => conv(substring(md5(g), 1, 15), 16, 10).cast("long") % M31))
        .as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == want, s"got=$got want=$want")
    assert(got(4L).size == 1) // six identical grams -> one hash
    assert(got(3L).size == 1) // empty doc -> hash of ""
  }

  test("minhash_over_set matches perms separate array_min(transform) columns") {
    import spark.implicits._
    val coefs = Dedup.portableCoefs(16)
    val rng = new scala.util.Random(31L)
    val df = (0 until 50).map(i =>
      (i.toLong, Seq.fill(rng.nextInt(20) + 1)(rng.nextLong().abs % M31)))
      .toDF("id", "sh")
    val got = df.select(col("id"),
      PortableText.minhash_over_set(col("sh"), coefs).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val wantCols = coefs.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("sh"), h => (h * a + b) % M31)).as(s"m$i")
    }
    val want = df.select(col("id") +: wantCols: _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 16).map(r.getLong(_)).toSeq).toMap
    assert(got == want)
  }

  test("null token array stays null") {
    import spark.implicits._
    val df = Seq((1L, Option(Seq("a", "b"))), (2L, None)).toDF("id", "toks")
    val rows = df.select(PortableText.portable_shingles(col("toks"), 3))
      .collect()
    assert(rows.count(_.isNullAt(0)) == 1)
  }

  test("portable_shingles_full matches portableHash kgrams, distinct, in order") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("the", "cat", "sat", "on", "the", "cat", "sat")),
      (2L, Seq("x")), (3L, Seq.empty[String])
    ).toDF("id", "toks")
    // the composed reference: explode kgrams, hash with the FULL 60-bit
    // md5-prefix (conv of the first 15 hex digits), distinct per doc
    val want = df.select(col("id"),
      explode(TextOps.kgrams(col("toks"), 3)).as("g"))
      .select(col("id"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.select(col("id"),
      explode(PortableText.portable_shingles_full(col("toks"), 3)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"got=$got want=$want")
  }

  test("xx_shingles matches xxhash64 of kgrams, distinct, in order") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("the", "cat", "sat", "on", "the", "cat", "sat")),
      (2L, Seq("x")), (3L, Seq.empty[String])
    ).toDF("id", "toks")
    val want = df.select(col("id"),
      explode(TextOps.kgrams(col("toks"), 3)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("h"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.select(col("id"),
      explode(PortableText.xx_shingles(col("toks"), 3)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"got=$got want=$want")
  }

  test("normalized minhash_over_set equals the MinHashSignature aggregate " +
      "over raw xxhash64 values") {
    import spark.implicits._
    val coefs = Seq((3L, 7L), (11L, 13L), (123456789L, 987654321L))
    val df = Seq(
      (1L, Seq(42L, -42L, Long.MinValue + 1, Long.MaxValue, 0L)),
      (2L, Seq(-1L))
    ).toDF("doc", "hs")
    val agg = df.select(col("doc"), explode(col("hs")).as("h"))
      .groupBy("doc")
      .agg(MinHashSignature.minhash_signature(col("h"), coefs).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val perRow = df.select(col("doc"),
      PortableText.minhash_over_set(col("hs"), coefs, normalize = true)
        .as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(perRow == agg, s"got=$perRow want=$agg")
  }
}
