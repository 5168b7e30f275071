package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupOps, GraphOps}

class GraphSpec extends AnyFunSuite with SharedSpark {

  test("q95 pagerank equals an exact driver-side replay of the integer iteration") {
    val got = GraphOps.q95(spark, SF).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent reference: same int64 recurrence run sequentially on
    // the collected edge set (tiny at test SF)
    val pairs = DedupOps.q50(spark, SF).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, SF).select("doc_id")
      .collect().map(_.getLong(0))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSeq }
    var r = docs.map(_ -> GraphOps.RankScale).toMap
    for (_ <- 1 to GraphOps.Iters) {
      val share = adj.map { case (b, ns) => b -> r(b) / ns.size }
      r = docs.map { d =>
        val cin = adj.getOrElse(d, Seq.empty).map(share).sum
        d -> (150000L + GraphOps.Damping * cin / 100)
      }.toMap
    }
    val want = r.map { case (d, m) => d -> m / 1000000.0 }
    assert(got === want)
  }

  test("q95 rank structure: isolates at 1-alpha, symmetric pairs equal, mass bounded") {
    val ranks = GraphOps.q95(spark, SF).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = ranks.size
    assert(n === Tables.documents(spark, SF).count())
    val deg = {
      val pairs = DedupOps.q50(spark, SF).select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      (pairs.map(_._1) ++ pairs.map(_._2)).groupBy(identity)
        .map { case (k, v) => k -> v.length }
    }
    // isolates hold exactly the teleport mass
    val isolates = ranks.keySet -- deg.keySet
    assert(isolates.nonEmpty) // test corpora are mostly unique docs
    isolates.foreach(d => assert(ranks(d) === 0.15))
    // connected docs accumulate strictly more than the teleport mass
    deg.keys.foreach(d => assert(ranks(d) > 0.15))
    // truncating shares only LOSE mass: total ≤ N, ≥ teleport floor
    val total = ranks.values.sum
    assert(total <= n.toDouble + 1e-6)
    assert(total >= 0.15 * n - 1e-6)
  }
}
