package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB fact-fact join strategy: bucket both tables on the join key
  * at write time, and the join plans with NO shuffle exchange on either
  * side — co-location replaces the network. The driver's test tables are
  * plain parquet, so this lives as a spec over bucketed copies rather
  * than a `queries` entry. */
class BucketJoinSpec extends AnyFunSuite with SharedSpark {

  test("bucketed tables join without a shuffle exchange") {
    val orders = Tables.orders(spark, SF)
    val lineitem = Tables.lineitem(spark, SF)
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    // the in-memory catalog is fresh per JVM: orphaned locations from a
    // previous run survive DROP TABLE, so clear them on disk too
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("g_orders_b", "g_lineitem_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("g_orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("g_lineitem_b")

    // at this SF the optimizer would broadcast instead (correctly — tiny
    // tables); disable it so the test exercises the big-big bucketed path
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, got) = try {
      val joined = spark.table("g_lineitem_b")
        .join(spark.table("g_orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      (joined.queryExecution.executedPlan.toString,
        joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    // only the final groupBy may shuffle; the join itself must not
    assert(shuffles <= 1, s"expected at most the aggregation exchange, got:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))

    // and the result equals the plain-parquet join
    val expect = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("q93 registered op writes really-bucketed tables and matches the plain join") {
    import graft.operators.Bucketed
    val got = Bucketed.q93(spark, SF).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // the catalog metadata carries the bucket spec — the layout exists,
    // it's not just a parquet copy
    val meta = spark.sql("DESCRIBE EXTENDED g93_lineitem").collect()
      .map(r => s"${r.getString(0)}: ${r.getString(1)}").mkString("\n")
    assert(meta.contains(s"Num Buckets: ${Bucketed.Buckets}"), meta)
    assert(meta.contains("Bucket Columns: [`l_orderkey`]"), meta)
    val expect = Tables.lineitem(spark, SF)
      .join(Tables.orders(spark, SF), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === expect)
    // idempotent: a second run (Verify/Bench re-invoke ops) is clean
    assert(Bucketed.q93(spark, SF).count() === got.size.toLong)
  }
}
