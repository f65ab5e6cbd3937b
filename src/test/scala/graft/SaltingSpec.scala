package graft

import org.apache.spark.sql.functions._
import graft.util.Salting

class SaltingSpec extends SparkSpec {

  test("saltedSumCount equals the plain aggregation on a skewed key") {
    val s = spark
    import s.implicits._
    // 'hot' carries 90% of rows
    val rows = (1 to 900).map(i => ("hot", (i % 7 + 1).toDouble)) ++
      (1 to 100).map(i => (s"cold${i % 5}", i.toDouble))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Salting.saltedSumCount(df, Seq("k"), "v", salts = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted === plain)
  }

  test("saltedJoin returns exactly the plain join's rows") {
    val s = spark
    import s.implicits._
    val fact = ((1 to 500).map(i => ("hot", i)) ++ (1 to 50).map(i => ("cold", i)))
      .toDF("k", "x")
    val dim = Seq(("hot", "H"), ("cold", "C"), ("unused", "U")).toDF("k", "label")
    val plain = fact.join(dim, "k").select("k", "x", "label")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(fact, dim, "k", salts = 4)
      .select("k", "x", "label").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 550)
  }
}
