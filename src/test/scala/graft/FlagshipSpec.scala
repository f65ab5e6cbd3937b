package graft

/** End-to-end check of the flagship E1 pipeline on real sf0.001 testdata:
  * shape, domains, and statistical sanity (no NaNs, valid p-range, df). */
class FlagshipSpec extends SparkSpec {

  test("flagship single-subject model produces a full beta/t/p table") {
    val out = graft.queries.Flagship.singleSubjectModel(spark, sf0001).collect()
    val k = graft.queries.Flagship.regressors.length
    assert(k === 40) // the full-width ssm_loop design: conv + dct/poly +
    // 24 motion covariates + 2 tissue + 8 spikes
    assert(out.length === 10 * k) // 10 groups × 40 regressors
    out.foreach { r =>
      val p = r.getAs[Double]("p")
      assert(p >= 0.0 && p <= 1.0, s"p out of range: $r")
      assert(!r.getAs[Double]("beta").isNaN)
      assert(r.getAs[Double]("sigma") >= 0.0)
      assert(r.getAs[Double]("df") === (2016 - k).toDouble)
    }
    // the intercept-ish column should pick up the mean activity: nonzero
    val poly0 = out.filter(_.getAs[String]("regressor") == "poly0")
    assert(poly0.exists(r => math.abs(r.getAs[Double]("beta")) > 0.0))
  }

  test("wide design is well-conditioned and betas match the closed form") {
    import graft.glm.LinAlg
    val regs = graft.queries.Flagship.regressors
    val rows = graft.queries.Flagship.designFrame(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("t") +:
        regs.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("t").collect()
    assert(rows.length === 2016)
    val x: LinAlg.Mat = rows.map(r => regs.indices.map(i => r.getDouble(i + 1)).toArray)
    // conditioning golden: pinv(X)·X must recover I to 1e-8 — catches a
    // near-singular 40-column design before it poisons every beta
    val pid = LinAlg.matmul(LinAlg.pinv(x), x)
    for (i <- regs.indices; j <- regs.indices) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(pid(i)(j) - want) < 1e-8, s"pinv·X[$i][$j] = ${pid(i)(j)}")
    }
    // closed-form golden on real data: group g=0's betas and sigma from
    // driver-side dense algebra must match the distributed fixed-point path
    val s = spark
    import org.apache.spark.sql.functions._
    val ser = graft.util.Tables.events(s, sf0001)
      .select((col("user_id") % 10).as("g"),
        expr("(ts div 1000 - 1704067200000000) div 300000000").as("t"),
        col("value").cast("decimal(18,2)").as("y"))
      .filter(col("g") === 0 && col("t") >= 0 && col("t") < 2016)
      .groupBy("t").agg(sum("y").as("y"))
      .collect().map(r => r.getLong(0).toInt -> r.getDecimal(1).doubleValue).toMap
    val y = Array.tabulate(2016)(t => ser.getOrElse(t, 0.0))
    val pinv = LinAlg.pinv(x)
    val beta = pinv.map(row => row.zip(y).map { case (w, v) => w * v }.sum)
    val fit = Array.tabulate(2016)(t => regs.indices.map(j => x(t)(j) * beta(j)).sum)
    val sigma = math.sqrt(y.zip(fit).map { case (a, b) => (a - b) * (a - b) }.sum / (2016 - 40))
    val got = graft.queries.Flagship.singleSubjectModel(spark, sf0001)
      .filter(col("g") === 0).collect()
      .map(r => r.getAs[String]("regressor") -> r).toMap
    for ((nm, j) <- regs.zipWithIndex) {
      val b = got(nm).getAs[Double]("beta")
      assert(math.abs(b - beta(j)) < 1e-4, s"beta($nm): $b vs ${beta(j)}")
    }
    assert(math.abs(got("poly0").getAs[Double]("sigma") - sigma) < 1e-4,
      s"sigma: ${got("poly0").getAs[Double]("sigma")} vs $sigma")
  }

  test("designFrame windows all carry the run partition key (no single-partition WindowExec)") {
    val df = graft.queries.Flagship.designFrame(spark, sf0001)
    assert(df.count() === 2016)
    assert(!df.columns.contains("run_id"), "internal run key must not leak")
    val plan = df.queryExecution.executedPlan.toString
    val windows = plan.split("\n").filter(_.contains("Window ["))
    assert(windows.nonEmpty)
    windows.foreach(l =>
      assert(l.contains("run_id"), s"unpartitioned window: $l"))
  }

  test("multi-subject model equals the single-subject pipeline per key") {
    import org.apache.spark.sql.functions._
    val s = spark
    // sf0.01 — the exact q104 configuration: at sf0.001 a 40-wide per-key
    // design goes rank-deficient (a key with no boxcar-covering purchase
    // trial zeroes a conv column; a 2-valued sparse activity signal makes
    // z² affine in z), which is data sparsity, not a pipeline property
    val ev = graft.util.Tables.events(s, sf001)
      .withColumn("run_id", col("user_id") % 4)
    val multi = graft.queries.Flagship.multiSubjectModel(s, ev).collect()
    val k = graft.queries.Flagship.regressors.length
    val keys = multi.map(_.getLong(0)).distinct.sorted
    assert(keys.length === 4)
    val byKey = multi.groupBy(_.getLong(0))
    for (key <- keys) {
      val single = graft.queries.Flagship
        .singleSubjectModelOf(s, ev.filter(col("run_id") === key))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r).toMap
      val mine = byKey(key)
      assert(mine.length === single.size, s"row count for key $key")
      mine.foreach { r =>
        val want = single((r.getLong(1), r.getString(2)))
        // same pipeline, different aggregation grouping ⇒ double sums may
        // differ in the last ulps through the z-scored confounds; the
        // models must agree far beyond any meaningful precision
        assert(math.abs(r.getDouble(3) - want.getAs[Double]("beta")) < 1e-4,
          s"beta key=$key $r vs $want")
        assert(math.abs(r.getDouble(4) - want.getAs[Double]("sigma")) < 1e-4,
          s"sigma key=$key $r vs $want")
        assert(r.getAs[Double]("df") === (2016 - k).toDouble)
      }
    }
  }

  test("distributed per-key weights path is BIT-equal to the collected broadcast path") {
    import org.apache.spark.sql.functions._
    val s = spark
    val ev = graft.util.Tables.events(s, sf001)
      .withColumn("run_id", col("user_id") % 4)
    // same LinAlg over the same doubles in the same t-order, whether the
    // pinv runs driver-side (collected+broadcast) or in executor mapGroups
    // (distributed, hint-free join) — IEEE determinism means EVERY value
    // must match exactly, not just to tolerance
    val dist = graft.queries.Flagship.multiSubjectModel(s, ev).collect()
    val coll = graft.queries.Flagship.multiSubjectModelCollected(s, ev).collect()
    assert(dist.length === coll.length)
    dist.zip(coll).foreach { case (a, b) => assert(a === b, s"$a vs $b") }
  }

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    // entry() installs TopKPerKey on the shared session; undo it so other
    // suites keep planning against stock Spark (SparkSpec's invariant —
    // PlanShapeSpec's q78 exchange count is sensitive to the extension)
    try assert(SparkEntry.entry(spark).count() > 0)
    finally graft.plans.TopKPerKey.uninstall(spark)
  }

  test("M5: per-regressor partitioned export (write.partitionBy)") {
    val out = java.nio.file.Files.createTempDirectory("graft-m5").toString
    graft.queries.Flagship.singleSubjectModel(spark, sf0001)
      .write.mode("overwrite").partitionBy("regressor").parquet(out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    // ssm_loop.py:99-102 writes one map per regressor; partitionBy is the
    // engine's single-write form of that loop
    assert(graft.queries.Flagship.regressors
      .forall(r => dirs.contains(s"regressor=$r")), s"missing partitions in $dirs")
    val back = spark.read.parquet(out)
    assert(back.count() === 10L * graft.queries.Flagship.regressors.length)
  }

  test("W7: spike regressors are one-hot at flagged TRs") {
    val tl = graft.design.DesignOps.timeline(spark, 6, 1.0)
    val out = graft.design.DesignOps.spikeRegressors(tl, Seq(1L, 4L))
      .orderBy("t").collect()
    assert(out.map(_.getAs[Double]("spike_1")).toSeq === Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    assert(out.map(_.getAs[Double]("spike_4")).toSeq === Seq(0.0, 0.0, 0.0, 0.0, 1.0, 0.0))
  }
}
