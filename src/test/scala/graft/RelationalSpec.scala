package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SharedSpark {

  test("q1 aggregates per (returnflag, linestatus) and counts every kept row") {
    val rows = Relational.q1(spark, SF).collect()
    assert(rows.length === 6) // 3 flags × 2 statuses
    val filtered = Tables.lineitem(spark, SF)
      .filter(col("l_shipdate") <= lit("2000-12-31").cast("date")).count()
    assert(rows.map(_.getAs[Long]("count_order")).sum === filtered)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("q6 decimal-exact revenue is stable across shuffle partitionings") {
    val a = Relational.q6(spark, SF).collect()(0).getAs[Double]("revenue")
    val b = Relational.q6(spark, SF).repartition(13).collect()(0).getAs[Double]("revenue")
    assert(a === b)
  }

  test("q9 top-k is sorted desc and bounded") {
    val rows = Relational.q9(spark, SF).collect()
    assert(rows.length === 25)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (x, y) => x >= y })
  }

  test("q10 window rank keeps at most 2 orders per customer") {
    val rows = Relational.q10(spark, SF).collect()
    assert(rows.forall(_.getAs[Long]("rn") <= 2))
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey")).values.map(_.length)
    assert(perCust.forall(_ <= 2))
  }

  test("q13 semi + complement anti partition the customer table") {
    val semi = Relational.q13(spark, SF).count()
    val withOrders = Tables.orders(spark, SF)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    assert(semi === withOrders)
  }

  test("q16 rollup grand-total row equals table count") {
    val all = Relational.q16(spark, SF)
      .filter(col("status") === "ALL" && col("priority") === "ALL").collect()
    assert(all.length === 1)
    assert(all(0).getAs[Long]("n_orders") === Tables.orders(spark, SF).count())
  }

  test("q19 decorrelated threshold matches a literal correlated evaluation") {
    val got = Relational.q19(spark, SF).collect()(0).getAs[Long]("n")
    val li = Tables.lineitem(spark, SF)
    val avg = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(col("l_quantity")) / count(lit(1)) * 0.5).as("t"))
    val expect = li.join(avg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("t")).count()
    assert(got === expect)
  }

  test("q24 percentiles are ordered p25 <= p50 <= p75") {
    val rows = Relational.q24(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("p25") <= r.getAs[Double]("p50"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p75"))
    }
  }
}
