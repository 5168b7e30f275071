package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EvalOps, TextOps}

/** Round-8 evaluation + corpus-QA wave (q138–q142). Property-level
  * assertions — the driver's DuckDB oracle covers value equality; these
  * pin the semantic invariants each statistic must satisfy regardless of
  * corpus, plus the scale-shape contracts. */
class EvalSpec extends AnyFunSuite with SharedSpark {

  test("q138: kappa is chance-corrected agreement with consistent parts") {
    val r = EvalOps.q138(spark, SF).collect()
    assert(r.length === 1)
    val row = r.head
    val n = row.getAs[Long]("n_docs")
    val agree = row.getAs[Long]("n_agree")
    val (po, pe, k) =
      (row.getAs[Double]("po"), row.getAs[Double]("pe"), row.getAs[Double]("kappa"))
    assert(n === Tables.documents(spark, SF).count())
    assert(agree > 0 && agree <= n)
    assert(po >= 0.0 && po <= 1.0)
    assert(pe > 0.0 && pe < 1.0)
    assert(k >= -1.0 && k <= 1.0)
    // the three surfaced ratios satisfy κ = (po − pe)/(1 − pe) up to the
    // 1e-6 half-away lattice each was independently rounded on
    assert(math.abs(k - (po - pe) / (1 - pe)) < 5e-6)
    // independent recount of the agreement cell
    val byHand = operators.TextOps.q44(spark, SF)
      .filter(col("matches_tag") === 1).count()
    assert(agree === byHand)
  }

  test("q139: ROC points are cumulative, monotone, and end at (1, 1)") {
    val rows = EvalOps.q139(spark, SF)
      .orderBy(col("threshold").desc).collect()
    assert(rows.nonEmpty)
    var (tp, fp) = (0L, 0L)
    rows.foreach { r =>
      val (ctp, cfp) = (r.getAs[Long]("cum_tp"), r.getAs[Long]("cum_fp"))
      assert(ctp >= tp && cfp >= fp, s"non-monotone at ${r.getAs[Double]("threshold")}")
      assert(ctp - tp + (cfp - fp) > 0, "empty score group")
      tp = ctp; fp = cfp
      val (tpr, fpr) = (r.getAs[Double]("tpr"), r.getAs[Double]("fpr"))
      assert(tpr >= 0 && tpr <= 1 && fpr >= 0 && fpr <= 1)
    }
    // the lowest threshold admits everything: rates close at exactly 1
    assert(rows.last.getAs[Double]("tpr") === 1.0)
    assert(rows.last.getAs[Double]("fpr") === 1.0)
  }

  test("q139: the curve's trapezoid area reconciles with q132's AUC") {
    val auc = TextOps.q132(spark, SF).collect().head.getAs[Double]("auc")
    val rows = EvalOps.q139(spark, SF).orderBy(col("threshold").desc).collect()
    var (area, px, py) = (0.0, 0.0, 0.0)
    rows.foreach { r =>
      val (x, y) = (r.getAs[Double]("fpr"), r.getAs[Double]("tpr"))
      area += (x - px) * (y + py) / 2; px = x; py = y
    }
    // both sides quantize at 1e-6 per point; |points| ≤ 1001 on the score
    // lattice bounds accumulated drift well under 1e-2
    assert(math.abs(area - auc) < 0.005, s"curve $area vs AUC $auc")
  }

  test("q140: Zipf fit matches a driver-side double-precision OLS replay") {
    val r = EvalOps.q140(spark, SF).collect()
    assert(r.length === 1)
    val row = r.head
    val k = row.getAs[Long]("k")
    val toks = Tables.documents(spark, SF)
      .select(explode(graft.text.Text.tokens(col("text"))).as("t"))
    val vocab = toks.distinct().count()
    assert(k === math.min(256L, vocab))
    val slope = row.getAs[Double]("slope")
    val icept = row.getAs[Double]("intercept")
    // the synthetic corpus is templated (31-token vocab): the gate reads
    // near-flat, NOT the natural-text ≈ −1 — which is exactly the drift
    // signal it exists to surface
    assert(slope < 0.0 && slope > -3.0, s"slope $slope out of range")
    // independent replay: top-K counts → double OLS on the same rounded
    // ln-micro lattice; the exact DECIMAL fold must agree to the lattice
    val top = toks
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t")).limit(256)
      .collect().map(_.getAs[Long]("n"))
    val xs = top.indices.map(i => math.round(math.log(i + 1.0) * 1e6).toDouble)
    val ys = top.map(n => math.round(math.log(n.toDouble) * 1e6).toDouble)
    val kk = top.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val s2 = (kk * sxy - sx * sy) / (kk * sxx - sx * sx)
    val i2 = (sy - s2 * sx) / kk / 1e6
    assert(math.abs(slope - s2) < 1e-4, s"slope $slope vs replay $s2")
    assert(math.abs(icept - i2) < 1e-4, s"intercept $icept vs replay $i2")
  }

  test("q141: every synthesized contact is detected and fully redacted") {
    val df = EvalOps.q141(spark, SF)
    val n = Tables.documents(spark, SF).count()
    assert(df.count() === n)
    // each row carries ≥1 of each PII kind by construction, and the
    // redacted text retains NONE of the patterns (phone/ip before
    // redaction double-checked on the redacted string itself)
    val bad = df.filter(
      col("n_email") < 1 || col("n_phone") < 1 || col("n_ip") < 1 ||
        col("redacted").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,4}") ||
        col("redacted").rlike("555-[0-9]{4}") ||
        col("redacted").rlike("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"))
      .count()
    assert(bad === 0L)
    assert(df.filter(col("redacted").contains("<EMAIL>")).count() === n)
    assert(df.filter(col("redacted").contains("<PHONE>")).count() === n)
    assert(df.filter(col("redacted").contains("<IP>")).count() === n)
  }

  test("q142: flag set is exactly the docs beyond 2×MAD, partition-exact") {
    val flagged = EvalOps.q142(spark, SF).collect()
    assert(flagged.nonEmpty, "gate never fires on this corpus — threshold untested")
    val med = flagged.head.getAs[Double]("median")
    val mad = flagged.head.getAs[Double]("mad")
    assert(mad > 0.0)
    // every flagged doc violates the bound; every unflagged doc satisfies
    // it — checked against an independent full-corpus scan
    flagged.foreach { r =>
      assert(math.abs(r.getAs[Long]("n_chars") - med) > 2 * mad,
        s"doc ${r.getAs[Long]("doc_id")} inside the bound")
      assert(r.getAs[Double]("deviation") ===
        math.abs(r.getAs[Long]("n_chars") - med))
    }
    val ids = flagged.map(_.getAs[Long]("doc_id")).toSet
    val outside = Tables.documents(spark, SF)
      .select(col("doc_id"), col("n_chars")).collect()
      .filter(r => math.abs(r.getAs[Long]("n_chars") - med) > 2 * mad)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids === outside)
  }

  test("scale shapes: q139/q140/q142 never sort or window the corpus") {
    // q139: the only window rides PrefixSum's ≤4096-row aggregated bins
    // (the ScalePlanSpec rule); q140's rank window rides the ≤256-row
    // limited relation; q142 is aggregate-shaped via OrderStats. Pin the
    // q140 contract here (the cheapest to assert structurally): no
    // unpartitioned window whose child is corpus-sized.
    val plan = EvalOps.q140(spark, SF).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    windows.foreach { w =>
      val limited = w.child.collectFirst {
        case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l }
      assert(limited.nonEmpty, "q140 window must ride the top-K limit")
    }
  }
}
