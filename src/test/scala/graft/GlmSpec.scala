package graft

import org.apache.spark.sql.functions._
import graft.glm.{GlmOps, LinAlg, TDist}

/** GLM numerics: t-distribution goldens against published t-table values,
  * LinAlg sanity, and the mass-GLM recovering known coefficients
  * (SURVEY.md §5.3 golden strategy).
  */
class GlmSpec extends SparkSpec {

  test("q116 normal-equations GLM: relational no-pivot solve matches LinAlg") {
    // the generated Gauss-Jordan chain (one selectExpr stage per pivot)
    // must solve the same normal system LinAlg solves — pin on a synthetic
    // SPD system pushed through the actual Spark expression chain
    val s = spark
    val k = 6
    // distinct per-column frequencies: same-frequency phase shifts would
    // span a 2-D space and make the normal matrix singular
    val x = Array.tabulate(40, k)((t, j) =>
      if (j == 0) 1.0 else math.sin((0.31 + 0.4 * j) * t + 0.1 * j))
    val bTrue = Array.tabulate(k)(j => 1.0 + j)
    val y = x.map(row => row.zip(bTrue).map { case (a, b) => a * b }.sum)
    val a = Array.tabulate(k, k)((i, j) =>
      x.map(r => r(i) * r(j)).sum)
    val bv = Array.tabulate(k)(i => x.zip(y).map { case (r, yy) => r(i) * yy }.sum)
    import s.implicits._
    val init = Seq(1).toDF("g").selectExpr(
      "g" +: ((for (i <- 0 until k; j <- 0 until k)
        yield s"CAST(${a(i)(j)} AS DOUBLE) AS d_${i}_$j") ++
        (0 until k).map(i => s"CAST(${bv(i)} AS DOUBLE) AS db_$i")): _*)
    val stages = graft.queries.Glm.gjStagesForTest(k)
    val solved = stages.foldLeft(init)((df, st) => df.selectExpr("g" +: st: _*))
      .selectExpr((0 until k).map(i => s"g${k - 1}_${i}_$k"): _*)
      .head()
    (0 until k).foreach { i =>
      assert(math.abs(solved.getDouble(i) - bTrue(i)) < 1e-8,
        s"beta $i: ${solved.getDouble(i)} vs ${bTrue(i)}")
    }
    // and the full query runs with finite betas on real data
    val out = graft.queries.Glm.normalGlm(s, sf0001).collect()
    assert(out.length === 10)
    assert(out.forall(r => (1 to 6).forall(c => !r.isNullAt(c) &&
      !r.getDouble(c).isNaN && !r.getDouble(c).isInfinite)))
  }

  test("q136 AR(1) GLM: zero group hits the den=0 branch with exact zeros") {
    val s = spark
    import s.implicits._
    val n = graft.queries.Glm.N
    // g=0: all-zero series → OLS betas 0 → residuals 0 → den=0 → rho=0,
    // whitened normal system solves to exact zeros
    val full = (0 until n).map(t => (0L, t.toLong, 0L)).toDF("g", "t", "y")
    val row = graft.queries.Glm.ar1Core(s, full).head()
    assert(row.getDouble(1) === 0.0) // rho
    (2 to 4).foreach(i => assert(row.getDouble(i) === 0.0))
  }

  test("q136 AR(1) GLM: planted AR(1) noise recovers rho; pure signal recovers betas") {
    val s = spark
    import s.implicits._
    val n = graft.queries.Glm.N
    val x = graft.queries.Glm.design
    val rnd = new scala.util.Random(42)
    // g=0: y = X·c + AR(1) noise at rho=0.8 (c in cents)
    val c = Array(200000.0, 50000.0, 30000.0)
    var ar = 0.0
    val g0 = (0 until n).map { t =>
      ar = 0.8 * ar + rnd.nextGaussian()
      val sig = (0 until 3).map(j => x(t)(j) * c(j)).sum
      (0L, t.toLong, math.rint(sig + 1000.0 * ar).toLong)
    }
    // g=1: pure signal, no noise (only integer-rounding residuals)
    val g1 = (0 until n).map { t =>
      val sig = (0 until 3).map(j => x(t)(j) * c(j)).sum
      (1L, t.toLong, math.rint(sig).toLong)
    }
    val out = graft.queries.Glm.ar1Core(s, (g0 ++ g1).toDF("g", "t", "y"))
      .collect().sortBy(_.getLong(0))
    val rho0 = out(0).getDouble(1)
    assert(rho0 > 0.55 && rho0 < 0.95, s"estimated rho $rho0 not near 0.8")
    // whitened betas still recover the planted signal within the noise
    (0 until 3).foreach { j =>
      val b = out(0).getDouble(2 + j)
      assert(math.abs(b - c(j)) < 20000.0, s"g0 beta_$j $b vs ${c(j)}")
    }
    // pure-signal group: betas to within integer-rounding error
    (0 until 3).foreach { j =>
      val b = out(1).getDouble(2 + j)
      assert(math.abs(b - c(j)) < 5.0, s"g1 beta_$j $b vs ${c(j)}")
    }
  }

  test("q136 AR(1) GLM: partition-invariant") {
    val s = spark
    import s.implicits._
    val n = graft.queries.Glm.N
    val rnd = new scala.util.Random(7)
    val rows = for (g <- 0L until 3L; t <- 0 until n)
      yield (g, t.toLong, rnd.nextInt(100000).toLong)
    val df = rows.toDF("g", "t", "y")
    val a = graft.queries.Glm.ar1Core(s, df).collect().toSeq
    val b = graft.queries.Glm.ar1Core(s, df.repartition(7)).collect().toSeq
    assert(a === b)
  }

  test("q140 second level: one-sample t matches the textbook formula; zero-variance is NULL") {
    val s = spark
    import s.implicits._
    // planted per-subject betas (already fixed-point): effect 2.5 ± noise
    val vals = Seq(2.4, 2.6, 2.5, 2.7, 2.3)
    val fl = vals.zipWithIndex.map { case (v, i) =>
      (0L, 0L, math.rint(v * 1e6).toLong)
    } ++ Seq.fill(3)((0L, 1L, 3000000L)) // constant -> var 0 -> t NULL
    val out = graft.queries.Glm.secondLevel(fl.toDF("run", "j", "b_fp"))
      .collect().map(r => r.getLong(1) -> r).toMap
    val n = vals.length
    val m = vals.sum / n
    val sd = math.sqrt(vals.map(v => (v - m) * (v - m)).sum / (n - 1))
    val t = m / (sd / math.sqrt(n))
    assert(out(0L).getLong(2) === n.toLong)
    assert(math.abs(out(0L).getDouble(3) - m) < 1e-9)
    assert(math.abs(out(0L).getDouble(4) - t) < 1e-6, s"t ${out(0L).getDouble(4)} vs $t")
    assert(out(1L).getDouble(3) === 3.0)
    assert(out(1L).isNullAt(4), "zero variance across subjects must yield NULL t")
  }

  test("q141 contrast: literal inverses check out; outputs agree with q60's betas/sigma") {
    // 2x2 [C (X'X)^-1 C']^-1 must invert its submatrix
    val x = graft.queries.Glm.design
    val xtx = LinAlg.matmul(LinAlg.transpose(x), x)
    val inv = LinAlg.inverse(xtx)
    val m = Array(Array(inv(1)(1), inv(1)(2)), Array(inv(2)(1), inv(2)(2)))
    val minv = LinAlg.inverse(m)
    val id = LinAlg.matmul(m, minv)
    assert(math.abs(id(0)(0) - 1) < 1e-10 && math.abs(id(1)(1) - 1) < 1e-10 &&
      math.abs(id(0)(1)) < 1e-10 && math.abs(id(1)(0)) < 1e-10)
    val vc = inv(1)(1) - 2 * inv(1)(2) + inv(2)(2)
    assert(vc > 0)
    // consistency with the q60 relation (both ride the same fit)
    val stats = graft.queries.Glm.massGlmStats(spark, sf0001).collect()
      .groupBy(_.getLong(0))
      .view.mapValues { rows =>
        val byJ = rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
        (byJ(1L), byJ(2L), rows.head.getDouble(3))
      }.toMap
    val out = graft.queries.Glm.contrastGlm(spark, sf0001).collect()
    assert(out.length == stats.size)
    out.foreach { r =>
      val (b1, b2, sigma) = stats(r.getLong(0))
      assert(math.abs(r.getDouble(1) - (b1 - b2)) < 1e-3, s"cope g=${r.getLong(0)}")
      if (sigma > 0)
        assert(math.abs(r.getDouble(2) - (b1 - b2) / (sigma * math.sqrt(vc))) < 1e-3,
          s"t_contrast g=${r.getLong(0)}")
    }
  }

  test("q145 despike: planted spikes are caught and clipped toward the trend; clean rows pass through") {
    val s = spark
    import s.implicits._
    val n = graft.queries.Glm.N
    val x = graft.queries.Glm.design
    val rnd = new scala.util.Random(11)
    val c = Array(200000.0, 40000.0, 25000.0)
    def trend(t: Int) = (0 until 3).map(j => x(t)(j) * c(j)).sum
    // g=0: smooth trend + small noise, two massive spikes planted
    val spikeTs = Set(30, 77)
    val rows = (0 until n).map { t =>
      val base = trend(t) + 200.0 * rnd.nextGaussian()
      val v = if (spikeTs(t)) base + 50000.0 else base
      (0L, t.toLong, math.rint(v).toLong)
    }
    val out = graft.queries.Glm.despikeCore(s, rows.toDF("g", "t", "y"))
      .collect().map(r => r.getLong(1).toInt ->
        ((r.getLong(3), r.getLong(2), r.getDouble(4)))).toMap
    // both spikes caught — MAD does not let a spike mask itself
    spikeTs.foreach { t =>
      val (isSpike, y, despiked) = out(t)
      assert(isSpike == 1L, s"t=$t must be flagged")
      assert(despiked < y - 30000.0, s"t=$t must be clipped far below the spike")
      assert(math.abs(despiked - trend(t)) < 10000.0,
        s"t=$t clipped value should sit near the trend")
    }
    // clean rows: untouched (y_despiked == y exactly)
    val dirty = out.count { case (t, (f, y, d)) => f == 1L || d != y.toDouble }
    assert(dirty <= 4, s"at most the spikes and a couple of noise tails move, got $dirty")
    (0 until n).filterNot(spikeTs).take(20).foreach { t =>
      val (f, y, d) = out(t)
      if (f == 0L) assert(d == y.toDouble)
    }
  }

  test("q145 despike: partition-invariant") {
    val s = spark
    import s.implicits._
    val n = graft.queries.Glm.N
    val rnd = new scala.util.Random(3)
    val rows = for (g <- 0L until 2L; t <- 0 until n)
      yield (g, t.toLong, rnd.nextInt(200000).toLong)
    val df = rows.toDF("g", "t", "y")
    val a = graft.queries.Glm.despikeCore(s, df).collect().toSeq
    val b = graft.queries.Glm.despikeCore(s, df.repartition(9)).collect().toSeq
    assert(a === b)
  }

  test("q146 ALFF: pure low-band signal gives fALFF ~1, pure high-band ~0; amplitude recovered") {
    val s = spark
    import s.implicits._
    val n = graft.queries.Glm.N
    def dct(k: Int, t: Int) = math.cos(math.Pi * (2 * t + 1) * k / (2.0 * n))
    val amp = 10000.0
    // g=0: pure k=1 (low band); g=1: pure k=8 (top of measured band)
    val rows = (0 until n).flatMap { t =>
      Seq((0L, t.toLong, math.rint(amp * dct(1, t)).toLong),
        (1L, t.toLong, math.rint(amp * dct(8, t)).toLong))
    }
    val out = graft.queries.Glm.alffCore(s, rows.toDF("g", "t", "y"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val (alff0, falff0) = out(0L)
    val (alff1, falff1) = out(1L)
    assert(falff0 > 0.999, s"low-band fALFF $falff0")
    assert(falff1 < 0.01, s"high-band fALFF $falff1")
    // c_1 = amp * N/2 for a pure DCT-1 signal (basis self-product sums to N/2)
    assert(math.abs(alff0 - amp * n / 2.0) < amp * 0.01, s"alff0 $alff0")
    assert(alff1 < amp, s"high-band signal carries no low-band power, alff1 $alff1")
  }

  test("q148 sign-flip: a strong consistent effect earns the minimal p; pure noise does not") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    // run 0: all 12 subjects' betas strongly positive (consistent effect);
    // run 1: symmetric noise around 0
    val fl = (0 until 12).flatMap { g =>
      Seq((0L, g.toLong, 0L, 5000000L + rnd.nextInt(100000)),
        (1L, g.toLong, 0L, (rnd.nextGaussian() * 1000000).toLong))
    }.toDF("run", "g", "j", "b_fp")
    val out = graft.queries.Glm.signFlipCore(s, fl)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    val (t0, p0) = out(0L)
    val (_, p1) = out(1L)
    assert(t0 > 10.0, s"consistent effect t $t0")
    // only sign patterns nearly all-positive can match: p near 1/257
    assert(p0 < 0.02, s"strong effect permutation p $p0")
    assert(p1 > 0.1, s"noise permutation p $p1")
    // deterministic: identical on rerun
    val again = graft.queries.Glm.signFlipCore(s, fl).collect().toSeq
    assert(again == graft.queries.Glm.signFlipCore(s, fl.repartition(7)).collect().toSeq)
  }

  test("q151 BH: hand-computed rejection set; step-up picks the LARGEST qualifying rank") {
    val s = spark
    import s.implicits._
    // m in the query is Runs*k = 16, alpha/m = 0.00625. Planted ps:
    // rank1 .004 <= .00625 ok; rank2 .014 > .0125 NOT ok alone, but
    // rank3 .018 <= .01875 ok -> step-up rejects ranks 1..3.
    val pp = Seq(
      (0L, 0L, 0.004), (0L, 1L, 0.014), (0L, 2L, 0.018), (0L, 3L, 0.5),
      (1L, 0L, 0.9), (1L, 1L, 0.7), (1L, 2L, 0.8), (1L, 3L, 0.6),
    ).toDF("run", "j", "p_perm")
    val out = graft.queries.Glm.fdrBhCore(pp)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(5)).toMap
    assert(out((0L, 0L)) && out((0L, 1L)) && out((0L, 2L)),
      "step-up must rescue rank 2 via rank 3")
    assert(!out((0L, 3L)) && !out((1L, 0L)))
    assert(out.values.count(identity) == 3)
  }

  test("q152 maxT: corrected p never below the per-hypothesis p; strong effect survives") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(9)
    val fl = (0 until 12).flatMap { g =>
      Seq((0L, g.toLong, 0L, 8000000L + rnd.nextInt(50000)), // strong
        (0L, g.toLong, 1L, (rnd.nextGaussian() * 1000000).toLong), // noise
        (1L, g.toLong, 0L, (rnd.nextGaussian() * 1000000).toLong))
    }.toDF("run", "g", "j", "b_fp")
    val perP = graft.queries.Glm.signFlipCore(s, fl)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val maxP = graft.queries.Glm.maxTCore(s, fl)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    maxP.foreach { case (k, pm) =>
      assert(pm >= perP(k) - 1e-9, s"$k: maxT $pm < per-hypothesis ${perP(k)}")
    }
    assert(maxP((0L, 0L)) < 0.02, "strong effect survives strong FWER control")
    assert(maxP((1L, 0L)) > 0.2, "noise does not")
  }

  test("TDist matches published two-sided critical values (p = 0.05)") {
    // t_{0.975, df}: df=1 → 12.706, df=10 → 2.228, df=30 → 2.042
    assert(math.abs(TDist.pTwoSided(12.706, 1) - 0.05) < 5e-4)
    assert(math.abs(TDist.pTwoSided(2.228, 10) - 0.05) < 5e-4)
    assert(math.abs(TDist.pTwoSided(2.042, 30) - 0.05) < 5e-4)
    // symmetry and limits
    assert(TDist.pTwoSided(0.0, 7) === 1.0)
    assert(TDist.pTwoSided(-2.228, 10) === TDist.pTwoSided(2.228, 10))
    assert(math.abs(TDist.cdf(0.0, 5) - 0.5) < 1e-12)
  }

  test("TDist approaches the normal for large df") {
    // z = 1.96 two-sided p → 0.05 as df → ∞
    assert(math.abs(TDist.pTwoSided(1.96, 100000) - 0.05) < 1e-3)
  }

  test("LinAlg inverse and pinv recover identity") {
    val a = Array(Array(4.0, 7.0), Array(2.0, 6.0))
    val inv = LinAlg.inverse(a)
    val id = LinAlg.matmul(a, inv)
    assert(math.abs(id(0)(0) - 1) < 1e-12 && math.abs(id(0)(1)) < 1e-12)
    assert(math.abs(id(1)(0)) < 1e-12 && math.abs(id(1)(1) - 1) < 1e-12)

    val x = Array.tabulate(10, 2)((t, j) => if (j == 0) 1.0 else t.toDouble)
    val p = LinAlg.pinv(x) // 2×10
    val pid = LinAlg.matmul(p, x) // → 2×2 identity
    assert(math.abs(pid(0)(0) - 1) < 1e-10 && math.abs(pid(1)(1) - 1) < 1e-10)
  }

  test("simpleOLS recovers exact line and t1 is infinite-free on noise") {
    val s = spark
    import s.implicits._
    // y = 3 + 2x exactly, plus a noisy group
    val exact = (1 to 20).map(i => ("g1", i.toDouble, 3.0 + 2.0 * i))
    val noisy = (1 to 20).map(i => ("g2", i.toDouble, 1.0 + 0.5 * i + (if (i % 2 == 0) 0.25 else -0.25)))
    val df = (exact ++ noisy).toDF("g", "x", "y")
    val r = GlmOps.simpleOLS(df, Seq("g"), "y", "x").collect()
      .map(row => row.getString(0) -> row).toMap
    assert(math.abs(r("g1").getAs[Double]("beta0") - 3.0) < 1e-9)
    assert(math.abs(r("g1").getAs[Double]("beta1") - 2.0) < 1e-9)
    assert(math.abs(r("g2").getAs[Double]("beta1") - 0.5) < 1e-2)
    assert(!r("g2").getAs[Double]("t1").isNaN)
  }

  test("massGLMPackedPerKey with one shared design is bit-identical to massGLMPacked") {
    val s = spark
    import s.implicits._
    val n = 24
    val x: LinAlg.Mat = Array.tabulate(n, 3) { (t, j) =>
      j match {
        case 0 => 1.0
        case 1 => (t - (n - 1) / 2.0) / n
        case 2 => math.cos(math.Pi * (2 * t + 1) / (2.0 * n))
      }
    }
    // 3 keys × 4 groups of deterministic pseudo-noise series
    val rows = for {
      key <- 0L to 2L
      g <- 0L to 3L
      t <- 0 until n
    } yield (key, g, t.toLong,
      BigDecimal((key * 31 + g * 17 + t * t * 7) % 97 - 48) / 100 * 25)
    val series = rows.toDF("key", "g", "t", "y_dec")
      .withColumn("y_dec", col("y_dec").cast("decimal(18,2)"))
    val perKey = GlmOps
      .massGLMPackedPerKey(s, series, (0L to 2L).map(k => (k, x)), "key", "g")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(perKey.size === 3 * 4 * 3)
    for (key <- 0L to 2L) {
      val single = GlmOps
        .massGLMPacked(s, series.filter(col("key") === key).drop("key"), x, "g")
        .collect()
      assert(single.length === 4 * 3)
      single.foreach { r =>
        val got = perKey((key, r.getLong(0), r.getLong(1)))
        // identical IEEE operation sequence on both paths ⇒ exact equality
        assert(got._1 === r.getDouble(2), s"beta key=$key $r")
        assert(got._2 === r.getDouble(3), s"sigma key=$key $r")
        assert(got._3 === r.getDouble(4), s"t key=$key $r")
        assert(got._4 === r.getDouble(5), s"p key=$key $r")
      }
    }
  }

  test("logistic GD separates separable data; training is partition-invariant") {
    import graft.glm.LogitOps
    val s = spark
    import s.implicits._
    // y = 1 iff x1 > 0 on a balanced symmetric design: the w0 gradient
    // cancels, one step already gives w1 > 0 ⇒ sign(margin) = sign(x1)
    val rows = (0 until 100).map { i =>
      val x1 = (i - 49.5) / 50.0
      (i.toLong, if (x1 > 0) 1.0 else 0.0, 1.0, x1)
    }
    val feats = rows.toDF("id", "y", "x0", "x1")
    val trace = LogitOps.gdStepsFp(feats, Seq("x0", "x1"), "y", steps = 8)
    val w = trace.last
    assert(w(1) > 0, s"slope should be positive: ${w.toSeq}")
    val scored = LogitOps.scoreWith(feats, Seq("x0", "x1"), w)
      .select(col("y"), col("keep")).collect()
    val acc = scored.count(r => (r.getDouble(0) == 1.0) == r.getBoolean(1))
    assert(acc === 100, s"separable accuracy $acc/100")
    // exact int64 gradient sums ⇒ identical trace on any partitioning
    val t7 = LogitOps.gdStepsFp(feats.repartition(7), Seq("x0", "x1"), "y", steps = 8)
    assert(trace.map(_.toSeq) === t7.map(_.toSeq))
    // and the loss-direction sanity: each step's slope never flips sign
    assert(trace.forall(_(1) >= 0))
  }

  test("massGLM treats missing timepoints as y = 0 (sparse series)") {
    val s = spark
    import s.implicits._
    val n = 16
    val x: LinAlg.Mat = Array.tabulate(n, 2)((t, j) => if (j == 0) 1.0 else t.toDouble / 10.0)
    // y = 3 + 2t/10 but timepoints 5 and 11 are ABSENT (→ implicit 0)
    val present = (0 until n).filterNot(t => t == 5 || t == 11)
    val series = present
      .map(t => ("a", t.toLong, BigDecimal(3.0 + 2.0 * t / 10.0).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .toDF("g", "t", "y_dec")
      .withColumn("y_dec", col("y_dec").cast("decimal(18,2)"))
    val out = GlmOps.massGLM(spark, series, x, "g").collect()
      .map(r => r.getLong(1) -> r).toMap
    // closed form on the zero-filled dense vector
    val y = (0 until n).map(t => if (t == 5 || t == 11) 0.0 else 3.0 + 2.0 * t / 10.0).toArray
    val pinv = LinAlg.pinv(x)
    val beta = pinv.map(row => row.zip(y).map { case (w, v) => w * v }.sum)
    val fit = (0 until n).map(t => x(t)(0) * beta(0) + x(t)(1) * beta(1))
    val sse = y.zip(fit).map { case (a, b) => (a - b) * (a - b) }.sum
    val sigma = math.sqrt(sse / (n - 2))
    for (j <- 0 until 2)
      assert(math.abs(out(j.toLong).getAs[Double]("beta") - beta(j)) < 1e-6)
    assert(math.abs(out(0L).getAs[Double]("sigma") - sigma) < 1e-6)
  }

  test("vif: independent regressors have VIF ≈ 1; a collinear one explodes") {
    val s = spark
    import s.implicits._
    // x1, x2 independent-ish; x3 = x1 + x2 (perfectly collinear would be
    // singular, so add a distinct wiggle)
    val rows = (1 to 200).map { i =>
      val x1 = (i % 7).toDouble
      val x2 = (i % 11).toDouble
      val x3 = x1 + x2 + (if (i % 2 == 0) 0.3 else -0.3)
      (x1, x2, x3)
    }
    val df = rows.toDF("x1", "x2", "x3")
    val v = graft.stats.StatsOps.vif(s, df, Seq("x1", "x2", "x3"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(v("x3") > 10.0) // near-collinear
    val two = graft.stats.StatsOps.vif(s, df, Seq("x1", "x2"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(two("x1") < 1.2 && two("x2") < 1.2) // ~independent
  }

  test("massGLMPacked is bit-identical to massGLM (incl. missing timepoints)") {
    val s = spark
    import s.implicits._
    val n = 20
    val x: LinAlg.Mat = Array.tabulate(n, 3) { (t, j) =>
      j match {
        case 0 => 1.0
        case 1 => (t - (n - 1) / 2.0) / 10.0
        case 2 => math.cos(math.Pi * (2 * t + 1) / (2.0 * n))
      }
    }
    // two groups, ragged presence, negative and positive y
    val rows = for {
      g <- Seq("a", "b")
      t <- 0 until n
      if !(g == "a" && t % 7 == 3)
    } yield (g, t.toLong,
      BigDecimal((if (g == "a") 1 else -1) * (3.7 * t % 11 - 5))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val series = rows.toDF("g", "t", "y_dec")
      .withColumn("y_dec", col("y_dec").cast("decimal(18,2)"))
      .repartition(7)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val classic = key(GlmOps.massGLM(spark, series, x, "g"))
    val packed = key(GlmOps.massGLMPacked(spark, series, x, "g"))
    assert(packed === classic) // EXACT double equality, not a tolerance
    assert(classic.size === 6)
  }

  test("massResiduals: near-zero residuals for y = Xβ; closed form on sparse series") {
    val s = spark
    import s.implicits._
    val n = 16
    val x: LinAlg.Mat = Array.tabulate(n, 2)((t, j) => if (j == 0) 1.0 else t.toDouble / 10.0)
    val present = (0 until n).filterNot(_ == 5)
    val series = present
      .map(t => ("a", t.toLong, BigDecimal(3.0 + 2.0 * t / 10.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .toDF("g", "t", "y_dec")
      .withColumn("y_dec", col("y_dec").cast("decimal(18,2)"))
    val out = GlmOps.massResiduals(spark, series, x, "g")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // closed form: betas fit the ZERO-FILLED series; residuals at observed
    // rows are y - X·β (t=5 is absent from the OUTPUT too — no y to subtract)
    val y = (0 until n).map(t => if (t == 5) 0.0 else 3.0 + 2.0 * t / 10.0).toArray
    val beta = LinAlg.pinv(x).map(row => row.zip(y).map { case (w, v) => w * v }.sum)
    assert(out.size === present.size && !out.contains(5L))
    present.foreach { t =>
      val expected = y(t) - (x(t)(0) * beta(0) + x(t)(1) * beta(1))
      assert(math.abs(out(t.toLong) - expected) < 1e-6, s"t=$t")
    }
  }

  test("massGLM recovers known betas from y = Xβ (closed form, 1e-6)") {
    val s = spark
    import s.implicits._
    val n = 24
    val x: LinAlg.Mat = Array.tabulate(n, 3) { (t, j) =>
      j match {
        case 0 => 1.0
        case 1 => (t - (n - 1) / 2.0) / 10.0
        case 2 => math.cos(math.Pi * (2 * t + 1) / (2.0 * n))
      }
    }
    val trueBeta = Map("a" -> Array(5.0, 2.0, -1.0), "b" -> Array(-3.0, 0.5, 4.0))
    // y rounded to 2 decimals (the DECIMAL(18,2) contract of massBetas)
    val rows = for {
      (g, b) <- trueBeta.toSeq
      t <- 0 until n
    } yield (g, t.toLong,
      BigDecimal(b.indices.map(j => x(t)(j) * b(j)).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val series = rows.toDF("g", "t", "y_dec")
      .withColumn("y_dec", col("y_dec").cast("decimal(18,2)"))

    val out = GlmOps.massGLM(spark, series, x, "g").collect()
    val byKey = out.map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    for ((g, b) <- trueBeta; j <- b.indices) {
      val row = byKey((g, j.toLong))
      // y was perturbed ≤ 0.005 by the decimal rounding → betas within ~1e-2
      assert(math.abs(row.getAs[Double]("beta") - b(j)) < 2e-2,
        s"beta($g, $j) = ${row.getAs[Double]("beta")} != ${b(j)}")
      assert(row.getAs[Double]("df") === (n - 3).toDouble)
      // tiny residuals → huge t, p near 0 for nonzero betas
      assert(row.getAs[Double]("p") <= 1.0 && row.getAs[Double]("p") >= 0.0)
    }
    // cross-check one group against the LinAlg closed form on the SAME y
    val yA = (0 until n).map { t =>
      rows.collectFirst { case ("a", tt, y) if tt == t => y.toDouble }.get
    }.toArray
    val pinvA = LinAlg.pinv(x)
    val closed = pinvA.map(row => row.zip(yA).map { case (w, y) => w * y }.sum)
    for (j <- 0 until 3) {
      val got = byKey(("a", j.toLong)).getAs[Double]("beta")
      // fixed-point pinv (×1e9 rounding) vs exact closed form
      assert(math.abs(got - closed(j)) < 1e-6, s"j=$j got=$got closed=${closed(j)}")
    }
  }

  test("q148/q151/q152: a zero-variance hypothesis reports NULL p and is never rejected") {
    val s = spark
    import s.implicits._
    val fl = ((0 until 10).map(g => (0L, g.toLong, 0L, 4000000L)) ++ // constant
      (0 until 10).map(g => (0L, g.toLong, 1L, (g * 1000000L - 4500000L)))) // spread
      .toDF("run", "g", "j", "b_fp")
    val pp = graft.queries.Glm.signFlipCore(s, fl)
    val rows = pp.collect().map(r => r.getLong(1) -> r).toMap
    assert(rows(0L).isNullAt(3) && rows(0L).isNullAt(4),
      "undefined test must be NULL, not minimally significant")
    assert(!rows(1L).isNullAt(4))
    val bh = graft.queries.Glm.fdrBhCore(pp).collect()
    assert(bh.forall(_.getLong(1) != 0L), "undefined hypothesis is excluded from BH")
    val mt = graft.queries.Glm.maxTCore(s, fl).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(mt(0L).isNullAt(3), "maxT of an undefined test is NULL")
  }

  test("q148: a degenerate sign pattern counts as an exceedance, not a free pass") {
    val s = spark
    import s.implicits._
    // two subjects at b and -b: the OBSERVED t is 0 (defined), but every
    // opposite-sign pattern flips the pair to (c, c) — zero variance,
    // NULL t_p. Counting those 0 would shrink p below the exact answer:
    // with t_obs = 0 no pattern can be strictly smaller, so p must be
    // (1 + 256)/257 = 1.0 — the conservative reading of an undefined
    // permutation statistic.
    val fl = Seq((0L, 0L, 0L, 3000000L), (0L, 1L, 0L, -3000000L))
      .toDF("run", "g", "j", "b_fp")
    val out = graft.queries.Glm.signFlipCore(s, fl).collect().head
    assert(!out.isNullAt(out.fieldIndex("p_perm")))
    assert(out.getDouble(out.fieldIndex("p_perm")) == 1.0,
      s"degenerate patterns must count as exceedances, got $out")
  }

  test("q157: AR(1) multi-run fit matches a driver-side Cochrane-Orcutt replay") {
    val s = spark
    import s.implicits._
    import graft.glm.LinAlg
    val G = graft.queries.Glm
    val k = 4
    val runs = Seq(0, 1)
    val gs = Seq(0L, 1L)
    // planted cents series: smooth design response + an AR(1)-ish wobble,
    // all integers (deterministic function of (run, g, t))
    def y(r: Int, g: Long, t: Int): Long = {
      val x = G.runDesign(r)(t)
      math.round(5000.0 * x(0) + 900.0 * x(1) + 700.0 * x(2) + 400.0 * x(3) +
        300.0 * math.sin(0.37 * t + g) + 150.0 * math.sin(0.36 * (t - 1) + g))
    }
    val filled = (for (r <- runs; g <- gs; t <- 0 until G.Nr)
      yield (r.toLong, g, t.toLong, y(r, g, t))).toDF("run", "g", "t", "y")
    val out = G.ar1MultiRunFirstLevelCore(s, filled)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(out.size == runs.size * gs.size * k)
    // exact driver replay of the engine's op sequence (incl. the 4-dp
    // summand rounding) — closed-form solve instead of Gauss-Jordan
    def r4(v: Double): Double =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (r <- runs; g <- gs) {
      val x = G.runDesign(r)
      val p = LinAlg.pinv(x)
      val ys = (0 until G.Nr).map(t => y(r, g, t).toDouble).toArray
      // OLS via the same fixed-point pinv weights
      val b = (0 until k).map(j => (0 until G.Nr)
        .map(t => math.rint(p(j)(t) * 1e9) * ys(t)).sum / 1e9).toArray
      val e = (0 until G.Nr).map(t =>
        ys(t) - (0 until k).map(j => x(t)(j) * b(j)).sum).toArray
      val num = (1 until G.Nr).map(t => r4(e(t) * e(t - 1))).sum
      val den = (1 until G.Nr).map(t => r4(e(t - 1) * e(t - 1))).sum
      val rho = if (den > 0) num / den else 0.0
      val a0 = Array.ofDim[Double](k, k)
      val a1 = Array.ofDim[Double](k, k)
      val a2 = Array.ofDim[Double](k, k)
      for (t <- 1 until G.Nr; i <- 0 until k; j <- 0 until k) {
        a0(i)(j) += x(t)(i) * x(t)(j)
        a1(i)(j) += x(t)(i) * x(t - 1)(j)
        a2(i)(j) += x(t - 1)(i) * x(t - 1)(j)
      }
      val m = Array.tabulate(k, k)((i, j) =>
        a0(i)(j) - rho * (a1(i)(j) + a1(j)(i)) + rho * rho * a2(i)(j))
      val wb = (0 until k).map(j => (1 until G.Nr).map(t =>
        r4((x(t)(j) - rho * x(t - 1)(j)) * (ys(t) - rho * ys(t - 1)))).sum).toArray
      val beta = LinAlg.matmul(LinAlg.inverse(m), Array(wb).transpose).map(_(0))
      for (j <- 0 until k) {
        val got = out((r.toLong, g, j.toLong)) / 1e6
        assert(math.abs(got - beta(j)) < 5e-5,
          s"run=$r g=$g j=$j engine=$got replay=${beta(j)} rho=$rho")
      }
      assert(rho > 0.01, s"planted wobble should yield positive rho, got $rho")
    }
  }

  test("q155: composed chain equals the four queries stitched row-for-row") {
    val s = spark
    val composed = graft.queries.Glm.inferenceChain(s, sf0001).collect().toSeq
    val second = graft.queries.Glm.groupGlm(s, sf0001)
    val sf = graft.queries.Glm.signFlip(s, sf0001)
      .select("run", "j", "t_obs", "p_perm")
    val bh = graft.queries.Glm.fdrBh(s, sf0001)
      .select("run", "j", "rk", "kbh", "rejected")
    val mt = graft.queries.Glm.maxT(s, sf0001).select("run", "j", "p_maxt")
    val expected = second.join(sf, Seq("run", "j"))
      .join(bh, Seq("run", "j"), "left")
      .join(mt, Seq("run", "j"))
      .selectExpr("run", "j", "n", "mean_beta", "t_group", "t_obs", "p_perm",
        "rk", "kbh", "COALESCE(rejected, false) AS rejected_bh",
        "p_maxt", "p_maxt <= 0.05 AS rejected_maxt")
      .orderBy("run", "j").collect().toSeq
    assert(composed.nonEmpty, "composed chain returned no hypotheses")
    assert(composed == expected,
      s"composed:\n${composed.mkString("\n")}\nchain:\n${expected.mkString("\n")}")
  }

  test("q155: a zero-variance hypothesis rides the composed chain as NULL/false") {
    val s = spark
    import s.implicits._
    val fl = ((0 until 10).map(g => (0L, g.toLong, 0L, 4000000L)) ++
      (0 until 10).map(g => (0L, g.toLong, 1L, (g * 1000000L - 4500000L))))
      .toDF("run", "g", "j", "b_fp")
    val out = graft.queries.Glm.inferenceChainCore(s, fl).collect()
      .map(r => r.getLong(1) -> r).toMap
    val z = out(0L)
    assert(z.isNullAt(z.fieldIndex("p_perm")), "undefined test must carry NULL p")
    assert(z.isNullAt(z.fieldIndex("rk")) && z.isNullAt(z.fieldIndex("kbh")),
      "undefined test is excluded from BH ranking")
    assert(!z.getBoolean(z.fieldIndex("rejected_bh")),
      "undefined test must not be BH-rejected")
    assert(z.isNullAt(z.fieldIndex("p_maxt")) &&
      z.isNullAt(z.fieldIndex("rejected_maxt")),
      "undefined test's maxT verdict is NULL")
    assert(!out(1L).isNullAt(out(1L).fieldIndex("p_perm")),
      "the defined hypothesis still gets a p")
  }
}
