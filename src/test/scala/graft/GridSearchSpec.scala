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

  test("q79 TF-IDF roster evaluates the paper's four models on the held-out fold") {
    val rows = MLOps.q79(spark, SF).collect()
    assert(rows.map(_.getAs[String]("model")).sorted.toSeq ===
      Seq("logreg", "naive_bayes", "random_forest", "svm_linear"))
    val nTest = Tables.documents(spark, SF)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_test") === nTest)
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      val f1 = r.getAs[Double]("f1")
      assert(f1 >= 0.0 && f1 <= 1.0)
    }
  }

  test("q81 WSS@95 over trained scores: four models, valid screening bounds, deterministic") {
    val a = MLOps.q81(spark, SF).collect()
    assert(a.map(_.getAs[String]("model")).sorted.toSeq ===
      Seq("logreg", "naive_bayes", "random_forest", "svm_linear"))
    a.foreach { r =>
      val (n, p) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"))
      val (t, k) = (r.getAs[Long]("t"), r.getAs[Long]("k_at_95"))
      assert(n > 0 && p > 0 && p <= n)
      assert(t === math.ceil(0.95 * p).toLong)
      // the screened prefix must at least hold the T positives it reaches
      assert(k >= t && k <= n)
      val wss = r.getAs[Double]("wss95")
      assert(wss === math.rint((1.0 - k.toDouble / n - 0.05) * 1e6) / 1e6)
      assert(wss >= -0.05 && wss <= 0.95)
    }
    // seeded training + deterministic split: identical output across runs
    val b = MLOps.q81(spark, SF).collect()
    assert(a.map(_.toSeq.toList).toList === b.map(_.toSeq.toList).toList)
    // a trained classifier should screen at least as well as random order:
    // its best model's prefix is no worse than scanning ~everything
    assert(a.map(_.getAs[Double]("wss95")).max > 0.0,
      "no model beats random screening on a separable-language corpus")
  }

  test("q176 trained quality gate: threshold replays exactly, gate covers both folds, deterministic") {
    val rows = MLOps.q176(spark, SF).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("q_score"),
        r.getAs[Int]("admitted")))
    val n = Tables.documents(spark, SF).count()
    assert(rows.length.toLong === n, "the gate must decide EVERY doc")
    // driver-side replay of the threshold over the op's OWN raw scores:
    // ascending rank ceil(0.75·n) with (score, doc_id) tiebreak, gate =
    // value comparison (ties at the cut all kept)
    val raw = MLOps.qualityScores(spark, SF).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    val k = MLOps.QualityGateRank(n)
    val thr = raw.sortBy { case (id, s) => (s, id) }.apply((k - 1).toInt)._2
    val expectAdmit = raw.filter(_._2 >= thr).map(_._1).toSet
    assert(rows.filter(_._3 == 1).map(_._1).toSet === expectAdmit)
    // the gate genuinely cuts (~bottom three quartiles) and keeps a
    // non-trivial corpus
    assert(rows.count(_._3 == 1) >= n / 4)
    assert(rows.count(_._3 == 0) > 0)
    // corpus-wide scoring: admitted docs appear in BOTH folds (the fit
    // is fold-bound, the gate is not)
    val admitted = rows.filter(_._3 == 1).map(_._1)
    assert(admitted.exists(_ % 5 == 0) && admitted.exists(_ % 5 != 0))
    // seeded fit + exact order statistic: identical across runs
    val b = MLOps.q176(spark, SF).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("q_score"),
        r.getAs[Int]("admitted")))
    assert(rows.toSeq === b.toSeq)
  }
}
