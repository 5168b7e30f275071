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

  test("q194 cohort retention: driver replay, offset-0 is definitionally 1.0, bounded rates") {
    import graft.operators.Events
    val rows = Events.q194(spark, SF).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getAs[Long]("n_active"),
        r.getAs[Long]("cohort_size"), r.getAs[Double]("retention")))
    assert(rows.nonEmpty)
    // independent driver-side replay of the integer week rule
    val epoch = java.time.LocalDate.parse("2024-01-01")
    val ev = Tables.events(spark, SF)
      .select("user_id", "ts").collect()
      .map { r =>
        val d = r.getTimestamp(1).toLocalDateTime.toLocalDate
        (r.getLong(0),
          java.time.temporal.ChronoUnit.DAYS.between(epoch, d) / 7)
      }
    val first = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val active = ev.distinct
    val cohSize = first.values.groupBy(identity).view.mapValues(_.size.toLong)
    val expect = active.map { case (u, w) => (first(u), w - first(u)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(t => (t._1, t._2)).toSet === expect.keySet)
    rows.foreach { case (cw, off, na, cs, ret) =>
      assert(na === expect((cw, off)))
      assert(cs === cohSize(cw))
      assert(ret === ((2L * na * 1000000L + cs) / (2L * cs)) / 1e6)
      assert(na <= cs && ret > 0.0 && ret <= 1.0)
      // every cohort member is active in their own first week
      if (off == 0L) assert(na === cs && ret === 1.0)
    }
    // (no decay assert: the dense synthetic stream keeps every user
    // active every week at this SF — a constant-1 matrix is correct)
  }
}
