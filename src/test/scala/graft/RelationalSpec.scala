package graft

import graft.queries.Relational
import graft.util.Tables

class RelationalSpec extends SparkSpec {

  test("pricing summary groups and sums positively") {
    val df = Relational.pricingSummary(spark, sf0001).collect()
    assert(df.nonEmpty)
    assert(df.forall(r => r.getDouble(r.fieldIndex("sum_qty")) > 0))
    assert(df.forall(r => r.getLong(r.fieldIndex("count_order")) > 0))
  }

  test("semi + anti join partition the customer table") {
    val cust = Tables.customer(spark, sf0001)
    val ords = Tables.orders(spark, sf0001)
    val total = cust.count()
    // same predicate as Relational.antiJoin, so semi + anti partition customer
    val bigOrders = ords.filter(ords("o_totalprice") > 300000.0)
    val semi = cust
      .join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_semi")
      .count()
    val anti = Relational.antiJoin(spark, sf0001).count()
    assert(semi + anti == total)
  }

  test("filter project only keeps matching rows") {
    val rows = Relational.filterProject(spark, sf0001).collect()
    assert(rows.forall(_.getDouble(2) > 100000.0))
  }

  test("q01 fixed-point sums are bit-identical to the DECIMAL(18,2) form") {
    import org.apache.spark.sql.functions._
    val dec = "decimal(18,2)"
    val decimalForm = spark.read.parquet(s"$sf001/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toString).toSeq
    val fixedForm = Relational.pricingSummary(spark, sf001)
      .collect().map(_.toString).toSeq
    assert(fixedForm == decimalForm) // exact == exact, no tolerance
  }
}
