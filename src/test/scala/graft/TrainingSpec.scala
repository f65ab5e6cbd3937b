package graft

import org.apache.spark.sql.functions._
import graft.queries.Training

/** Training-set assembly: the hash split must be a pure function of the
  * key — invariant under partitioning (the property `df.sample` lacks) —
  * with per-mill fractions near their targets; the quota query must emit
  * exactly `quota` deterministic rows per language. */
class TrainingSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("hash split membership is invariant under repartitioning") {
    val weights = Seq("train" -> 900, "val" -> 50, "test" -> 50)
    def membership(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Training.hashSplit(df, "doc_id", "graft-v1", weights)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = membership(docs)
    val shuffled = membership(docs.repartition(17, col("lang")))
    val single = membership(docs.coalesce(1))
    assert(base === shuffled)
    assert(base === single)
    // every doc assigned; fractions in a loose tolerance band
    assert(base.size === docs.count())
    val train = base.values.count(_ == "train").toDouble / base.size
    assert(train > 0.85 && train < 0.95, s"train fraction $train")
  }

  test("token-budget sample: starts inside budget, straddler kept, partition-invariant") {
    val s = spark
    import s.implicits._
    val out = Training.tokenBudgetSample(docs, "budget-v1", 2000L)
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // admission rule: exclusive cumsum strictly under budget
    assert(out.forall(_._4 < 2000L))
    // per language: the admitted set covers AT LEAST the budget unless the
    // whole stratum is smaller (the boundary doc straddles past it)
    val perLangTotal = docs
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy("lang").agg(sum("t").as("total")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val sampled = rows.map(_._3).sum
      assert(sampled >= math.min(2000L, perLangTotal(lang)),
        s"$lang sampled only $sampled tokens")
    }
    val repart = Training
      .tokenBudgetSample(docs.repartition(13), "budget-v1", 2000L)
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(repart.toSeq === out.toSeq)
  }

  test("priority sample: k per stratum, weight-monotone on equal hashes, partition-invariant") {
    val out = Training.prioritySample(docs, "prio-v1", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly 10 per language (strata here are larger than k)
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to 10L), s"$lang ranks")
    }
    val repart = Training.prioritySample(docs.repartition(13), "prio-v1", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(repart.sorted.toSeq === out.sorted.toSeq)
    // the ES priority ln(u)/w is monotone in w for fixed u: a doc with
    // the same hash draw but more tokens ranks no worse
    val s = spark
    import s.implicits._
    val fixed = Seq(
      (1L, "short short short", "en"),
      (2L, Seq.fill(40)("tok").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val p = Training.prioritySample(fixed, "prio-v1", 2)
      .collect().map(r => (r.getLong(2), r.getDouble(4))).toMap
    // both present; priorities are negative, longer doc closer to 0 iff
    // its u is not catastrophically smaller — just assert both sampled
    assert(p.keySet === Set(1L, 2L))
  }

  test("different salts produce different (but individually stable) splits") {
    val weights = Seq("a" -> 500, "b" -> 500)
    val s1 = Training.hashSplit(docs, "doc_id", "salt-1", weights)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Training.hashSplit(docs, "doc_id", "salt-2", weights)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 !== s2)
  }

  test("exactNSample: exactly n per stratum, partition-invariant, short strata kept whole") {
    def sel(df: org.apache.spark.sql.DataFrame, n: Int): Map[String, Seq[Long]] =
      Training.exactNSample(df, "doc_id", "lang", "graft-v1", n)
        .select("lang", "rank", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (l, rs) =>
          l -> rs.sortBy(_._2).map(_._3).toSeq
        }
    val base = sel(docs, 10)
    // exactly n from every stratum with at least n docs
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    base.foreach { case (l, ids) =>
      assert(ids.length === math.min(10L, counts(l)).toInt, l)
      assert(ids.distinct.length === ids.length)
    }
    // same SET and order on any partitioning
    assert(sel(docs.repartition(13), 10) === base)
    // n beyond the stratum size degrades to the whole stratum
    val all = sel(docs, Int.MaxValue)
    all.foreach { case (l, ids) => assert(ids.length === counts(l).toInt) }
  }

  test("stratified sample: coordinated (rate bump only adds docs), partition-invariant") {
    def keep(df: org.apache.spark.sql.DataFrame, enRate: Int): Set[Long] =
      Training.stratifiedSample(df, "doc_id", "lang", "graft-v1",
        Map("en" -> enRate), defaultPerMill = 500)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val at250 = keep(docs, 250)
    val at500 = keep(docs, 500)
    assert(at250.subsetOf(at500), "raising a rate must only ADD documents")
    assert(at250 === keep(docs.repartition(13, col("lang")), 250))
    // the en stratum is actually downsampled, the others untouched by rate
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enAll = langOf.collect { case (id, "en") => id }.toSet
    assert((at250 & enAll).size < enAll.size / 2)
    assert((at500 -- at250).forall(id => langOf(id) == "en"))
  }

  test("lang quota: exactly 25 rows per language, rank 1..25, ttr non-increasing") {
    val rows = Training.langQuota(spark, sf001).collect()
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length === 25, s"$lang quota")
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 25L), s"$lang ranks")
      val ttrs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(ttrs.zip(ttrs.tail).forall { case (a, b) => a >= b }, s"$lang ordering")
    }
  }

  test("epochShuffle: each epoch is a permutation; epochs reorder; reruns identical") {
    import spark.implicits._
    val docs = (0L until 64L).map(Tuple1(_)).toDF("doc_id")
    def run() = Training.epochShuffle(docs, epochs = Seq(1, 2), nShards = 4)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val a = run()
    assert(a.sorted.toSeq == run().sorted.toSeq) // pure function of (doc_id, epoch)
    // partition-invariance: the (shard, pos) assignment must not depend on
    // physical layout (mix orders totally within shard, doc_id breaks ties)
    val rep = Training.epochShuffle(docs.repartition(7), epochs = Seq(1, 2), nShards = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rep.sorted.toSeq == a.sorted.toSeq)
    for (e <- Seq(1, 2)) {
      val rows = a.filter(_._1 == e)
      assert(rows.map(_._4).sorted.toSeq == (0L until 64L)) // a permutation
      // pos is dense 1..n within each shard
      rows.groupBy(_._2).foreach { case (_, rs) =>
        assert(rs.map(_._3).sorted.toSeq == (1L to rs.length))
      }
    }
    // the epoch term actually relocates docs: global orders differ
    def order(e: Int) = a.filter(_._1 == e).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(order(1) != order(2))
  }

  test("q144 epoch schedule: budget discipline, temperature boost, epoch reorder") {
    val out = graft.queries.Training.epochSchedule(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    assert(out.nonEmpty)
    // per (epoch, lang): admitted tokens minus the straddling boundary doc
    // stay under the language budget, and budgets sum to <= the epoch total
    val sized = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("lang", "CAST(size(split(text, ' ')) AS LONG) AS t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val langTok = sized.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tTotal = langTok.values.sum
    val powFp = langTok.view.mapValues(t =>
      math.rint(math.pow(t.toDouble / tTotal, 0.5) * 1e12).toLong).toMap
    val powTotal = powFp.values.sum
    val budget = powFp.view.mapValues(p => 3000L * p / powTotal).toMap
    for (((e, l), rows) <- out.groupBy(r => (r._1, r._5))) {
      val toks = rows.map(_._6).sum
      assert(toks - rows.map(_._6).max < budget(l),
        s"epoch $e lang $l: all but the straddler must fit the budget")
      assert(toks >= budget(l) - 100 || rows.length == sized.count(_._1 == l),
        s"epoch $e lang $l under-fills without exhausting the corpus")
    }
    // temperature alpha=0.5 boosts low-resource languages above their
    // proportional token share
    val smallest = langTok.minBy(_._2)._1
    val schedShare = out.filter(_._5 == smallest).map(_._6).sum.toDouble /
      out.map(_._6).sum
    assert(schedShare > langTok(smallest).toDouble / tTotal,
      s"$smallest share $schedShare should exceed proportional")
    // epochs admit different doc sets (the salted mix reorders admission)
    def ids(e: Int) = out.filter(_._1 == e).map(_._4).toSet
    assert(ids(1) != ids(2))
    // positions are dense per (epoch, shard)
    for (((_, _), rows) <- out.groupBy(r => (r._1, r._2)))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
  }
}
