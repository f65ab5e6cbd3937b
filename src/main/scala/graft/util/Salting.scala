package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4, the "salting for skew" scale
  * path). Salting never changes results — it only re-shapes the shuffle —
  * so the salt can use engine-native `hash()` freely even though checked
  * query OUTPUTS never do. AQE's skew-join handling covers most cases at
  * runtime; explicit salting is for the hot keys you know about (e.g. one
  * subject with 100× the voxels, one document cluster with a boilerplate
  * shingle).
  */
object Salting {

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (keys, salt) — spreading each hot key over `salts` reducers — then
    * final-aggregate on keys. Exactness: pass DECIMAL/integer aggregates
    * (sum/count), which re-combine associatively.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int): DataFrame = {
    val salt = pmod(hash(col(valueCol), spark_partition_id()), lit(salts))
    df.withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__ps"),
        count(lit(1)).as("__pc"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__ps").cast("double").as("sum_value"), sum("__pc").as("n"))
  }

  /** Salted equi-join of a skewed fact to a dimension: the fact side gets
    * a salt in [0, salts); the dimension is exploded ×salts so every
    * (key, salt) bucket finds its row. Output rows are identical to the
    * plain join; each hot key's probe work is spread over `salts` tasks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
