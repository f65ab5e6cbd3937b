package graft

import org.apache.spark.sql.functions._
import graft.functions.SpaceSavingAgg
import graft.text.RetrievalOps

/** Space-Saving heavy hitters (functions/SpaceSaving.scala): the q88
  * oracle hash-match covers the exact regime at volume; these pin the
  * hand arithmetic, the exact-regime partitioning invariance, and the
  * overflow-regime guarantees the oracle can't see (estimates bracket the
  * truth, heavy items survive eviction).
  */
class SpaceSavingSpec extends SparkSpec {

  private def corpus(texts: String*) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def trueCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("exact regime: counts match a hand count, err is 0, rank by (cf desc, term)") {
    val docs = corpus("a a b c", "b a d", "c a")
    // a→4, b→2, c→2, d→1
    val rows = RetrievalOps.heavyHitters(docs, capacity = 16, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1L, "a", 4L, 0L), (2L, "b", 2L, 0L), (3L, "c", 2L, 0L), (4L, "d", 1L, 0L)))
  }

  test("exact regime is bit-identical under any partitioning") {
    val texts = (0 until 97).map(i => s"w${i % 13} w${i % 7} w${i % 13}")
    val docs = corpus(texts: _*)
    val one = RetrievalOps.heavyHitters(docs.repartition(1), 64, 20)
      .orderBy("rank").collect().toSeq
    val many = RetrievalOps.heavyHitters(docs.repartition(11), 64, 20)
      .orderBy("rank").collect().toSeq
    assert(one === many)
    val expect = trueCounts(texts)
    one.foreach { r =>
      assert(r.getLong(2) === expect(r.getString(1)), s"term ${r.getString(1)}")
      assert(r.getLong(3) === 0L)
    }
  }

  test("overflow regime: estimates bracket the truth and heavy hitters survive") {
    // Zipf-ish corpus: h0..h3 heavy, t0..t39 light singletons per doc.
    val texts = (0 until 50).map { i =>
      val heavy = Seq.fill(8)(s"h${i % 4}")
      val light = Seq(s"t${i % 40}", s"t${(i * 7) % 40}")
      (heavy ++ light).mkString(" ")
    }
    val docs = corpus(texts: _*).repartition(5)
    val expect = trueCounts(texts)
    val n = expect.values.sum
    val capacity = 8 // 44 distinct terms >> capacity → eviction fires
    val rows = RetrievalOps.heavyHitters(docs, capacity, k = capacity)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= capacity)
    rows.foreach { case (term, est, err) =>
      val truth = expect.getOrElse(term, 0L)
      assert(est >= truth, s"$term overestimate invariant")
      assert(est - err <= truth, s"$term error bracket")
    }
    // every item with true frequency > n/capacity must be in the summary
    val kept = rows.map(_._1).toSet
    expect.filter(_._2 > n / capacity).keys.foreach { hh =>
      assert(kept.contains(hh), s"heavy hitter $hh evicted")
    }
  }

  test("a single over-capacity document cannot escape the fixed-size buffer") {
    // first reduce() into a ZERO buffer with > capacity distinct terms:
    // the empty-side early return must still trim, or a partial summary
    // exceeds `capacity` counters and breaks the O(capacity × partitions)
    // communication bound
    val agg = new SpaceSavingAgg(4)
    val wide = agg.reduce(agg.zero, (0 until 10).map(i => s"t$i"))
    assert(wide.terms.length <= 4, s"partial holds ${wide.terms.length} counters")
    assert(wide.overflowed)
  }

  test("exactly-capacity distinct terms stay exact across disjoint merges") {
    // a summary holding exactly `capacity` terms with NO eviction must
    // merge with absent-key bound 0 (overflow is an explicit flag, not a
    // size inference) — disjoint sides stay err 0 and exact
    val agg = new SpaceSavingAgg(4)
    val a = agg.reduce(agg.zero, Seq("a", "b", "a"))  // 2 distinct
    val b = agg.reduce(agg.zero, Seq("c", "d", "c", "d"))  // 2 distinct
    val m = agg.merge(a, b) // 4 = capacity distinct, no trim anywhere
    assert(!m.overflowed)
    val again = agg.merge(m, agg.reduce(agg.zero, Seq("a")))
    // still no eviction (a is already present): counts exact, errs all 0
    assert(agg.finish(again).items.map(i => (i.term, i.estCf, i.err)) ===
      Seq(("a", 3L, 0L), ("c", 2L, 0L), ("d", 2L, 0L), ("b", 1L, 0L)))
  }

  test("aggregator merge is order-insensitive in the exact regime") {
    val agg = new SpaceSavingAgg(16)
    val z = agg.zero
    val a = agg.reduce(z, Seq("x", "y", "x"))
    val b = agg.reduce(agg.zero, Seq("y", "z"))
    val ab = agg.finish(agg.merge(a, b))
    val ba = agg.finish(agg.merge(b, a))
    assert(ab === ba)
    assert(ab.items.map(i => (i.term, i.estCf, i.err)) ===
      Seq(("x", 2L, 0L), ("y", 2L, 0L), ("z", 1L, 0L)))
  }
}
