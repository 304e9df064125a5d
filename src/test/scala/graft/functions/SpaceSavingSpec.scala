package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** SpaceSaving sketch guarantees, exercised through the distributed path
  * (repartitioned input forces partial-state merges): exactness when the
  * sketch is bigger than the domain, count/error bounds on skewed data,
  * and the n/m presence guarantee.
  */
class SpaceSavingSpec extends SparkSpecBase {

  private def sketchOf(rows: Seq[String], m: Int, parts: Int) = {
    import spark.implicits._
    rows.toDF("tok").repartition(parts)
      .agg(SpaceSavingSketch.space_saving(col("tok"), m).as("s"))
      .select(explode(col("s")).as("e"))
      .select("e.item", "e.count", "e.error")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("sketch larger than the domain is exact with zero error") {
    val data = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val out = sketchOf(scala.util.Random.shuffle(data), m = 8, parts = 4)
    assert(out.toSet == Set(("a", 30L, 0L), ("b", 20L, 0L), ("c", 10L, 0L)))
  }

  test("skewed stream: bounds hold and heavy items are present") {
    // 4 heavy items (600, 500, 400, 300) over 60 singleton light items
    val heavy = Seq("h1" -> 600, "h2" -> 500, "h3" -> 400, "h4" -> 300)
    val data = heavy.flatMap { case (t, n) => Seq.fill(n)(t) } ++
      (1 to 60).map(i => s"light$i")
    val exact = data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = data.size.toLong
    val m = 16
    val out = sketchOf(scala.util.Random.shuffle(data), m = m, parts = 8)
    val est = out.map { case (t, c, e) => t -> ((c, e)) }.toMap

    // every heavy item clears the n/m guarantee threshold -> present
    heavy.foreach { case (t, f) =>
      assert(f > n / m)
      assert(est.contains(t), s"guaranteed heavy hitter $t missing")
    }
    // bounds: count upper-bounds f, count - error lower-bounds f
    out.foreach { case (t, c, e) =>
      val f = exact.getOrElse(t, 0L)
      assert(c >= f, s"$t: count $c < true $f")
      assert(c - e <= f, s"$t: lower bound ${c - e} > true $f")
    }
    // the heavy items dominate the top of the sketch
    val top4 = out.sortBy { case (t, c, _) => (-c, t) }.take(4).map(_._1).toSet
    assert(top4 == Set("h1", "h2", "h3", "h4"), s"top4=$top4")
  }

  test("state stays bounded at m counters") {
    val data = (1 to 5000).map(i => s"t${i % 500}")
    val out = sketchOf(data, m = 32, parts = 8)
    assert(out.length <= 32)
  }

  test("property: bounds hold on random zipf-ish streams through merges") {
    // driver-side state machine mirror of the distributed path: random
    // streams split into random partitions, per-partition sketches,
    // merged pairwise in random order — count/error bounds must hold on
    // every resident item for every trial
    val rng = new scala.util.Random(271828)
    for (_ <- 1 to 50) {
      val domain = 5 + rng.nextInt(120)
      val n = 200 + rng.nextInt(2000)
      val m = 4 + rng.nextInt(24)
      // zipf-ish skew: item id ~ floor(domain * u^3)
      val stream = Seq.fill(n) {
        val u = rng.nextDouble()
        s"w${(domain * u * u * u).toInt}"
      }
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val parts = stream.grouped(1 + rng.nextInt(200)).toSeq
      val sketches = parts.map { p =>
        val st = new SpaceSavingState(m)
        p.foreach(st.addOne)
        st
      }
      val agg = SpaceSavingSketch(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), m)
      val merged = rng.shuffle(sketches)
        .reduce((a, b) => agg.merge(a, b))
      merged.sorted.foreach { case (t, c, e) =>
        val f = exact.getOrElse(t, 0L)
        assert(c >= f, s"m=$m n=$n: $t count $c < true $f")
        assert(c - e <= f, s"m=$m n=$n: $t lower ${c - e} > true $f")
      }
      assert(merged.items.size() <= m)
    }
  }
}
