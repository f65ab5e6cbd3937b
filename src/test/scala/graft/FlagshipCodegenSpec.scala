package graft

import org.apache.spark.sql.DataFrame
import graft.queries.Flagship

/** Whole-stage-codegen health of the FLAGSHIP family (q48/q104/q109) — the
  * reference's E1 entry point. Runs each pipeline under
  * `spark.sql.codegen.fallback=false`, so a Janino "Code grows beyond 64 KB"
  * in any generated stage THROWS instead of silently dropping the hottest
  * query family to interpreted eval (the r11 regression: the q109
  * exact-integer design rewrite pushed one projection's processNext() past
  * the JVM method limit and Spark fell back without failing any test).
  */
class FlagshipCodegenSpec extends SparkSpec {

  private def withNoFallback[A](body: => A): A = {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => conf.set("spark.sql.codegen.fallback", v)
      case None => conf.unset("spark.sql.codegen.fallback")
    }
  }

  private def runs(df: => DataFrame): Unit = withNoFallback {
    assert(df.count() > 0L)
  }

  test("q109 keyed design compiles in every stage") {
    runs(Flagship.keyedDesign(spark, sf0001))
  }

  test("q48 single-subject flagship GLM compiles in every stage") {
    runs(Flagship.singleSubjectModel(spark, sf0001))
  }

  test("q104 multi-subject flagship GLM compiles in every stage") {
    // sf0.01: at sf0.001 some keys' 40-column designs are singular (too few
    // events per run); the correctness gate runs q104 at sf0.01 too
    runs(Flagship.multiSubjectQuery(spark, sf001))
  }
}
