package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MLOps

/** q146 learning curve: shape (roster × nested fractions), and the 100%
  * endpoint reconciles EXACTLY with q81 (wss95) and q79 (f1) — it is by
  * construction the same featurizer/split/roster setting. */
class LearningCurveSpec extends AnyFunSuite with SharedSpark {

  test("q146 curve shape, nested subsets, and endpoint reconciliation") {
    val curve = MLOps.q146(spark, SF).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val models = curve.keys.map(_._1).toSet
    val fracs = Seq(10, 25, 50, 100)
    assert(models === Set("naive_bayes", "logreg", "svm_linear", "random_forest"))
    assert(curve.size === models.size * fracs.size)
    // n_train: strictly increasing across the nested fractions, identical
    // across models at each fraction; n_test constant everywhere
    models.foreach { m =>
      val ns = fracs.map(f => curve((m, f))._1)
      assert(ns === ns.sorted && ns.distinct === ns, s"$m n_train: $ns")
      assert(fracs.map(f => curve((m, f))._2).distinct.size === 1)
    }
    fracs.foreach { f =>
      assert(models.map(m => curve((m, f))._1).size === 1 ||
        models.map(m => curve((m, f))._1).toSeq.distinct.size === 1)
    }
    // endpoint ≡ q81 (same split, featurizer, roster, scaffold)
    val q81 = MLOps.q81(spark, SF).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    models.foreach { m =>
      assert(curve((m, 100))._4 === q81(m), s"$m wss95 endpoint vs q81")
    }
    // endpoint f1 ≡ q79 (same predictions, same rounding)
    val q79 = MLOps.q79(spark, SF).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    models.foreach { m =>
      assert(curve((m, 100))._3 === q79(m), s"$m f1 endpoint vs q79")
    }
  }
}
