package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite with SharedSpark {

  test("salted join equals the plain join row-for-row") {
    val orders = Tables.orders(spark, SF)
      .select(col("o_custkey").as("k"), col("o_orderkey"), col("o_totalprice"))
    val dims = Tables.customer(spark, SF)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = orders.join(dims, "k")
      .select("k", "o_orderkey", "c_mktsegment")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(orders, dims, "k", salts = 8)
      .select("k", "o_orderkey", "c_mktsegment")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length === plain.length)
    assert(salted === plain)
  }

  test("salted join scatters a hot key across salt values") {
    import spark.implicits._
    val hot = Seq.fill(1000)(1L).toDF("k")
    val dim = Seq((1L, "x")).toDF("k", "v")
    val out = Skew.saltedJoin(hot, dim, "k", salts = 8)
    assert(out.count() === 1000)
  }
}
