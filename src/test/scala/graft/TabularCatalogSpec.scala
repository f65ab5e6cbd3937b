package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.tabular.TsvOps
import graft.catalog.BidsCatalog
import graft.functions.{OlsAggregator, TCdf}
import graft.glm.TDist

/** Reference-shaped fixtures (FIXTURES.md A2/A3): TSV with n/a nulls and
  * dynamic motion_outlier columns, BIDS path entity extraction, the native
  * t_pvalue expression, and the typed OLS aggregator.
  */
class TabularCatalogSpec extends SparkSpec {

  test("readTsvNa: n/a → null, dynamic outlier columns discovered by prefix") {
    val dir = Files.createTempDirectory("graft-tsv")
    val tsv = dir.resolve("confounds.tsv")
    Files.writeString(tsv,
      "trans_x\ttrans_y\tcsf\tmotion_outlier00\tmotion_outlier01\n" +
        "n/a\t0.1\t1.5\t0\t0\n" +
        "0.2\t0.3\tn/a\t1\t0\n" +
        "0.4\t0.5\t1.7\t0\t1\n")
    val df = TsvOps.readTsvNa(spark, tsv.toString)
    assert(df.count() === 3)
    assert(df.filter(col("trans_x").isNull).count() === 1) // n/a parsed as null
    assert(df.schema("trans_y").dataType.typeName === "double")
    assert(TsvOps.columnsByPrefix(df, "motion_outlier") ===
      Seq("motion_outlier00", "motion_outlier01"))
    // N=0 outliers case (FIXTURES.md A2): prefix scan returns empty
    assert(TsvOps.columnsByPrefix(df.select("trans_x", "csf"), "motion_outlier").isEmpty)
  }

  test("motionCovariates: quadratic expansion with zero-filled leading diff") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 1.0), (1L, 3.0), (2L, 6.0)).toDF("t", "mx")
    val out = TsvOps.motionCovariates(df, Seq("mx"), "t").orderBy("t").collect()
    assert(out.map(_.getAs[Double]("mx_sq")).toSeq === Seq(1.0, 9.0, 36.0))
    assert(out.map(_.getAs[Double]("mx_d")).toSeq === Seq(0.0, 2.0, 3.0)) // leading 0
    assert(out.map(_.getAs[Double]("mx_d_sq")).toSeq === Seq(0.0, 4.0, 9.0))
  }

  test("motionCovariates: multi-subject partitioned run equals per-subject application") {
    val s = spark
    import s.implicits._
    val rows = for (sub <- Seq("a", "b", "c"); t <- 0L to 9L)
      yield (sub, t, (sub.hashCode % 7) * 1.0 + t * t * 0.5)
    val df = rows.toDF("subject", "t", "mx")
    val together = TsvOps
      .motionCovariates(df, Seq("mx"), "t", partitionCols = Seq("subject"))
      .orderBy("subject", "t").collect().toSeq
    val solo = Seq("a", "b", "c").flatMap { sub =>
      TsvOps.motionCovariates(df.filter(col("subject") === sub), Seq("mx"), "t")
        .orderBy("t").collect().toSeq
    }
    assert(together === solo)
    // the lag windows must carry the partition key — no "move all data to
    // a single partition" WindowExec anywhere in the plan
    val plan = TsvOps
      .motionCovariates(df, Seq("mx"), "t", partitionCols = Seq("subject"))
      .queryExecution.executedPlan.toString
    val windows = plan.split("\n").filter(_.contains("Window ["))
    assert(windows.nonEmpty)
    windows.foreach(l =>
      assert(l.contains("subject"), s"unpartitioned window: $l"))
    // BySubject wrapper is the same operator
    val wrapped = TsvOps.motionCovariatesBySubject(df, Seq("mx"), "subject", "t")
      .orderBy("subject", "t").collect().toSeq
    assert(wrapped === together)
  }

  test("BidsCatalog extracts entities and answers BIDSLayout-style queries") {
    val s = spark
    import s.implicits._
    val paths = Seq(
      "bids/sub-004/func/sub-004_task-MID_run-1_bold.nii.gz",
      "bids/sub-004/func/sub-004_task-MID_events.tsv",
      "bids/derivatives/fmriprep/sub-004/func/sub-004_task-MID_space-MIITRA_desc-preproc_bold.nii.gz",
      "bids/sub-011/anat/sub-011_T1w.nii.gz",
    ).toDF("path")
    val cat = BidsCatalog.fromPaths(paths)
    val row = cat.filter(col("path").contains("run-1")).head()
    assert(row.getAs[String]("subject") === "004")
    assert(row.getAs[String]("task") === "MID")
    assert(row.getAs[Int]("run") === 1)
    assert(row.getAs[String]("suffix") === "bold")
    assert(row.getAs[String]("extension") === ".nii.gz")
    assert(row.getAs[String]("scope") === "raw")

    // the ssm_loop.py:60 query shape: subject+task+suffix+space+derivatives
    val hit = BidsCatalog.query(cat, Map(
      "subject" -> "004", "task" -> "MID", "suffix" -> "bold",
      "space" -> "MIITRA", "scope" -> "derivatives"))
    assert(hit.count() === 1)
    assert(BidsCatalog.query(cat, Map("subject" -> "011")).head()
      .getAs[String]("suffix") === "T1w")
    assert(BidsCatalog.queryRegex(cat, "task", "^M.*").count() === 3)
  }

  test("native t_pvalue expression matches TDist and handles null") {
    val s = spark
    import s.implicits._
    TCdf.register(s)
    val df = Seq((2.228, 10.0)).toDF("t", "df")
    val got = df.select(TCdf.t_pvalue(col("t"), col("df"))).head().getDouble(0)
    assert(got === TDist.pTwoSided(2.228, 10.0))
    val sqlGot = s.sql("SELECT t_pvalue(2.228D, 10D)").head().getDouble(0)
    assert(sqlGot === got)
    val nullRow = Seq((Option.empty[Double], 10.0)).toDF("t", "df")
      .select(TCdf.t_pvalue(col("t"), col("df"))).head()
    assert(nullRow.isNullAt(0))
  }

  test("OlsAggregator recovers the line in a typed groupByKey aggregation") {
    val s = spark
    import s.implicits._
    val ds = (1 to 50).map(i => (i.toDouble, 2.0 + 0.5 * i)).toDS()
    val fit = ds.groupByKey(_ => "g").agg(OlsAggregator.toColumn).collect()
    assert(fit.length === 1)
    val (_, f) = fit.head
    assert(f.n === 50L)
    assert(math.abs(f.beta0 - 2.0) < 1e-9)
    assert(math.abs(f.beta1 - 0.5) < 1e-9)
  }
}
