package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.TextOps.{bigrams, remove_tokens}

/** Kernel semantics for the fused token-array expressions, plus the
  * plan-shape property they exist for: the t16/t21 corpus passes must not
  * re-shuffle the token stream to do per-row array work. */
class TextOpsSpec extends SparkSpecBase {

  test("tokens matches the composed filter(split(lower(trim)))) chain") {
    import spark.implicits._
    val df = Seq(
      (1L, "  The  Quick\tbrown\nfox  "),
      (2L, ""), (3L, "   "), (4L, "\t\nMiXeD Case\t"),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    for (lower <- Seq(true, false)) {
      val base = if (lower) org.apache.spark.sql.functions.lower(trim(col("text")))
        else trim(col("text"))
      val want = df.select(col("id"),
        filter(split(base, "\\s+"), t => length(t) > 0).as("toks"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
      val got = df.select(col("id"),
        TextOps.tokens(col("text"), lowercase = lower).as("toks"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
      assert(got == want, s"lowercase=$lower: got=$got want=$want")
    }
  }

  test("kgrams: windows, short-doc collapse, k=1 verbatim, null stays null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("x", "y")),   // n < k: one all-token shingle
      (3L, Seq.empty[String]), // empty: [""] for k>1
      (4L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "toks")
    val k3 = df.select(col("id"), TextOps.kgrams(col("toks"), 3).as("g"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(k3(1L) == Seq("a b c", "b c d"))
    assert(k3(2L) == Seq("x y"))
    assert(k3(3L) == Seq(""))
    assert(k3(4L) == null)
    val k1 = df.select(col("id"), TextOps.kgrams(col("toks"), 1).as("g"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(k1(1L) == Seq("a", "b", "c", "d"))
    assert(k1(3L) == Seq.empty) // unigram path has no short-collapse row
  }

  test("bigrams pairs adjacent tokens; <2 tokens yields empty; null stays null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c", "b")),
      (2L, Seq("only")),
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "toks").select(col("id"), bigrams(col("toks")).as("bg"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b", "b c", "c b"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq.empty)
    assert(got(4L) == null)
  }

  test("bigrams matches the window-lead formulation on fixture text") {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
      x => length(x) > 0)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(200)
      .select(col("doc_id"), toks.as("toks")).cache()
    try {
      val fused = docs
        .select(col("doc_id"), explode(bigrams(col("toks"))).as("bigram"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val windowed = docs
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
        .withColumn("nxt", lead(col("tok"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
      assert(fused.exceptAll(windowed).isEmpty && windowed.exceptAll(fused).isEmpty)
      assert(fused.count() > 0)
    } finally docs.unpersist()
  }

  test("remove_tokens preserves order, drops all matches, handles edges") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("the", "cat", "the", "hat"), Seq("the")),
      (2L, Seq("a", "b"), Seq("a", "b")),
      (3L, Seq("x", "y"), Seq.empty[String]),
      (4L, Seq.empty[String], Seq("z")),
      (5L, null.asInstanceOf[Seq[String]], Seq("z"))
    ).toDF("id", "toks", "stop")
      .select(col("id"), remove_tokens(col("toks"), col("stop")).as("kept"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("cat", "hat"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq("x", "y"))
    assert(got(4L) == Seq.empty)
    assert(got(5L) == null)
  }

  test("collapse_ws matches regexp_replace(s, \\s+, ' ') on edges and random text") {
    import spark.implicits._
    val fixed = Seq(
      "", " ", "\t", "  ", "a b", "a  b", " a ", "\t\na\fb\r",
      "no_whitespace", "tab\tonly", "ünïcode  späces\tokay",
      "trailing run   ", "   leading", "\r\n", "a b" /* NBSP: NOT \s */)
    val rng = new scala.util.Random(3)
    val alphabet = "ab \t\n\f\rxyzäß日"
    val rand = Seq.fill(300)(
      Seq.fill(rng.nextInt(24))(alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = (fixed ++ rand).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    val rows = df.select(col("id"),
        regexp_replace(col("text"), "\\s+", " ").as("want"),
        TextOps.collapse_ws(col("text")).as("got"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) == r.getString(1),
        s"id=${r.getLong(0)}: got=${r.getString(2).map(_.toInt)} " +
          s"want=${r.getString(1).map(_.toInt)}")
    }
    // null propagates
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(TextOps.collapse_ws(col("text"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("ascii_class_counts matches length(regexp_replace) counting on edges") {
    import spark.implicits._
    val df = Seq(
      (1L, "The quick... brown!? FOX jumps."),
      (2L, ""), (3L, "   \t\n"), (4L, "no punct at all"),
      (5L, "UPPER lower 12345 .,;!?"),
      (6L, "unicode: café über 世界! end?"),
      (7L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val classes = Seq(".!?", ('a' to 'z').mkString, ('A' to 'Z').mkString,
      ('a' to 'z').mkString + ('A' to 'Z').mkString + " ")
    val want = df.select(col("id"),
      length(regexp_replace(col("text"), "[^.!?]", "")).as("c0"),
      length(regexp_replace(col("text"), "[^a-z]", "")).as("c1"),
      length(regexp_replace(col("text"), "[^A-Z]", "")).as("c2"),
      length(regexp_replace(col("text"), "[^a-zA-Z ]", "")).as("c3"))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(i =>
        if (r.isNullAt(i)) null else r.getInt(i))).toMap
    val cc = TextOps.ascii_class_counts(col("text"), classes)
    val got = df.select(col("id"), cc.as("cc"))
      .select(col("id"), col("cc")(0), col("cc")(1), col("cc")(2), col("cc")(3))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(i =>
        if (r.isNullAt(i)) null else r.getInt(i))).toMap
    assert(got == want, s"got=$got want=$want")
    // the \s-complement count (t23's meanLen numerator) on the same rows
    val wantWs = df.select(col("id"),
      length(regexp_replace(col("text"), "\\s", "")).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    val gotWs = df.select(col("id"), (length(col("text")) -
      TextOps.ascii_class_counts(col("text"),
        Seq(" \t\n\u000B\f\r"))(0)).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(gotWs == wantWs, s"got=$gotWs want=$wantWs")
  }

  test("count_tokens_in matches size(filter(toks, isin)) incl. edges") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("the", "cat", "the", "hat", "a")),
      (2L, Seq("none", "here")),
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "toks")
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    val want = df.select(col("id"),
      size(filter(col("toks"), x => x.isin(stop.map(lit): _*))).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    val got = df.select(col("id"),
      TextOps.count_tokens_in(col("toks"), stop).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(got == want, s"got=$got want=$want")
  }

  test("token_stats matches the explode+groupBy aggregate formulation") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("the", "cat", "the", "hat")),
      (2L, Seq("solo")),
      (3L, Seq("a", "bb", "ccc", "a", "bb", "a"))
    ).toDF("doc_id", "toks")
    val agg = df.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_n"),
        sum(length(col("tok")) * col("c")).as("sum_len"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = df.select(col("doc_id"),
      TextOps.token_stats(col("toks")).as("st"))
      .select(col("doc_id"), col("st")("n_tokens"), col("st")("n_distinct"),
        col("st")("top_n"), col("st")("sum_len"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == agg, s"got=$got want=$agg")
  }

  test("t15 plans ZERO exchanges: per-doc stats never shuffle the corpus") {
    val t15 = graft.SparkEntry.queries("t15_gopher_rules")(
      spark, "/root/testdata/sf0.001")
    val p = t15.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"t15 reintroduced a corpus shuffle:\n$p")
  }

  test("t16 plans no Window and t21 no per-doc re-aggregation: the token " +
      "stream is never shuffled to reassemble rows") {
    val t16 = graft.SparkEntry.queries("t16_rare_bigrams")(
      spark, "/root/testdata/sf0.001")
    val p16 = t16.queryExecution.executedPlan.toString
    assert(!p16.contains("Window"), s"t16 reintroduced a window sort:\n$p16")

    val t21 = graft.SparkEntry.queries("t21_stopword_strip")(
      spark, "/root/testdata/sf0.001")
    val p21 = t21.queryExecution.executedPlan.toString
    assert(!p21.contains("collect_list(struct"),
      s"t21 reintroduced positional reassembly:\n$p21")
    // the doc-side output must come straight off the scan: no exchange may
    // partition by doc_id ALONE (a per-doc reassembly); the df ranking's
    // (doc_id, tok) distinct shuffle is the only legal doc_id appearance
    val perDocExchange = """hashpartitioning\(doc_id#\d+L?, \d+\)""".r
    assert(perDocExchange.findFirstIn(p21).isEmpty,
      s"t21 shuffled the corpus by doc_id:\n$p21")
  }
}
