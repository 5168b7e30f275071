package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MLOps

class GridSearchSpec extends AnyFunSuite with SharedSpark {

  test("q73 grid search is deterministic and flags exactly one winner") {
    val a = MLOps.q73(spark, SF).collect()
    val b = MLOps.q73(spark, SF).collect()
    assert(a.length === 4) // 2 regParam × 2 elasticNet
    assert(a.map(_.toSeq.toList).toList === b.map(_.toSeq.toList).toList,
      "seeded CV must produce identical metrics and winner across runs")
    assert(a.map(_.getAs[Int]("is_best")).sum === 1)
    // the flagged row carries the max cross-validated metric
    val best = a.filter(_.getAs[Int]("is_best") == 1).head.getAs[Double]("avg_auc")
    assert(a.forall(_.getAs[Double]("avg_auc") <= best))
  }
}
