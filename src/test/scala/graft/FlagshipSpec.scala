package graft

/** End-to-end check of the flagship E1 pipeline on real sf0.001 testdata:
  * shape, domains, and statistical sanity (no NaNs, valid p-range, df). */
class FlagshipSpec extends SparkSpec {

  test("flagship single-subject model produces a full beta/t/p table") {
    val out = graft.queries.Flagship.singleSubjectModel(spark, sf0001).collect()
    val k = graft.queries.Flagship.regressors.length
    assert(out.length === 10 * k) // 10 groups × 6 regressors
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

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
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
