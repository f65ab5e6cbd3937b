package graft

/** Driver-contract invariants: the things Verify/Bench and the DuckDB
  * compare rely on structurally. */
class ContractSpec extends SparkSpec {

  test("query names are unique and q-numbered") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size === names.distinct.size)
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")))
    // the bench compact line keys on the pre-underscore prefix — it must
    // stay unique as the suite crosses 100
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.size === prefixes.distinct.size)
    assert(names.size >= 54)
  }

  test("entry() returns rows (the driver's smoke check)") {
    // entry() installs TopKPerKey on the shared session; undo it so other
    // suites keep planning against stock Spark (SparkSpec's invariant)
    try assert(SparkEntry.entry(spark).count() > 0L)
    finally graft.plans.TopKPerKey.uninstall(spark)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only queries are the documented four") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly === Set(
      "q32_ols_pvalues", // Student-t CDF has no DuckDB form
      "q48_flagship_glm", // data-dependent design matrix + t CDF
      "q55_approx_stats", // sketches differ across engines by design
      "q104_multi_subject_glm", // per-key data-dependent designs + t CDF
    ))
  }

  test("q55 sketches bound their exact counterparts") {
    val rows = SparkEntry.queries("q55_approx_stats")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.1, s"HLL off >10%: $r")
      assert(r.getAs[Double]("approx_p50") > 0.0)
    }
  }

  test("oracle SQL contains no tabs (driver JSON-escape hazard)") {
    // Verify.q escapes control chars, but keeping SQL tab-free avoids any
    // downstream parser disagreement in the first place
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\t"), s"$name oracle contains a tab")
    }
  }

  test("Graft.install wires the SQL surface and the top-k rewrite, idempotently") {
    val hadTopK = spark.experimental.extraStrategies
      .contains(graft.plans.TopKPerKeyStrategy)
    try {
      Graft.install(spark)
      Graft.install(spark) // second call must not duplicate strategies
      assert(spark.experimental.extraStrategies
        .count(_ == graft.plans.TopKPerKeyStrategy) == 1)
      val hashed = spark.sql("SELECT poly_hash('abc') AS h").head().getLong(0)
      assert(hashed == (((('a'.toInt * 31) + 'b'.toInt) * 31 + 'c'.toInt) % 1000000007))
      val dedup = spark
        .sql("SELECT seg_dedup('a b a b', 2).clean_text AS t").head().getString(0)
      assert(dedup == "a b")
    } finally {
      // the suite shares one session: PlanShapeSpec's window-shape pins
      // assume the rewrite is NOT installed unless they install it
      if (!hadTopK) graft.plans.TopKPerKey.uninstall(spark)
    }
  }
}
