package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PipelineOps

/** r6: the mixture micros arithmetic on the DECIMAL(38,0) lattice.
  *
  * q114's rate rule and q120's water-filling fixpoint form products of
  * corpus TOKEN MASSES with 10⁶ (eighths·raw·10⁶, share·T, alloc·10⁶).
  * In int64 those wrap past ~10¹² tokens per language — silently, below
  * the 100 TB ≈ 2.5×10¹³-token design point. The lift runs the same
  * half-away formula on DECIMAL(38,0) (Num.idivHalfAwayBig) and narrows
  * only the bounded results (micros ≤ 10⁶, alloc ≤ clean) back to long.
  *
  * This spec is the no-wraparound proof the lift ships with: synthetic
  * per-language masses ≥ 10¹³ tokens — with the old int64 numerators
  * ASSERTED to exceed Long.MaxValue, so the overflow regime is really
  * exercised — are pushed through q114PolicyOf / q120PolicyOf and every
  * output column is compared against an exact BigInt replay of the same
  * formulas on the driver. A small-mass case pins that the decimal form
  * is bit-identical to the (exact, in-range) arithmetic the int64 form
  * used to compute, so test-SF oracle hashes are unchanged by design.
  */
class MixDecimalSpec extends AnyFunSuite with SharedSpark {

  private val M = BigInt(1000000)

  /** ⌊p/q⌉ half-away-from-zero — the Num.idivHalfAway formula, exact. */
  private def halfAway(p: BigInt, q: BigInt): BigInt =
    if (p >= 0) (p * 2 + q) / (q * 2) else -(((-p) * 2 + q) / (q * 2))

  private def rate114(eighths: BigInt, raw: BigInt, clean: BigInt): BigInt =
    if (clean == 0) M
    else M.min(halfAway(eighths * raw * M, BigInt(8) * clean))

  private def docsOf(rows: Seq[(Long, String, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "rt", "ct")
  }

  /** (lang → (eighths, raw, clean, rate_micros)) from the Spark side. */
  private def policy114(docs: DataFrame) =
    PipelineOps.q114PolicyOf(docs).collect().map { r =>
      r.getAs[String]("lang") ->
        ((BigInt(r.getAs[Long]("eighths")), BigInt(r.getAs[Long]("raw_tokens")),
          BigInt(r.getAs[Long]("clean_tokens")), BigInt(r.getAs[Long]("rate_micros"))))
    }.toMap

  // ~2.5×10¹³ raw tokens per major language — the 100 TB design point,
  // ~25× past the old int64 numerator bound. "qq" has clean ≪ raw so the
  // UNCAPPED quotient alone exceeds int64; "zz" has clean = 0 (guard
  // branch); "fr" is the one language whose corrected rate lands
  // strictly between its configured rate and 1 (a real fractional case).
  private val hugeDocs = Seq(
    (1L, "en", 12500000000000L, 8000000000000L),
    (2L, "en", 12500000000000L, 8100000000000L),
    (3L, "de", 11000000000000L, 9500000000000L),
    (4L, "de", 11000000000000L, 9600000000000L),
    (5L, "fr", 10000000000000L, 8300000000000L),
    (6L, "fr", 10000000000000L, 8400000000000L),
    (7L, "qq", 90000000000000L, 1L),
    (8L, "zz", 12500000000000L, 0L))

  test("q114 rate arithmetic is exact at >=10^13-token masses (BigInt replay)") {
    val got = policy114(docsOf(hugeDocs))
    assert(got.keySet === Set("en", "de", "fr", "qq", "zz"))
    got.foreach { case (lang, (eighths, raw, clean, rate)) =>
      // the old int64 numerator genuinely wraps at these masses
      assert(eighths * raw * M > BigInt(Long.MaxValue),
        s"$lang: masses too small to exercise the overflow regime")
      assert(rate === rate114(eighths, raw, clean), s"lang $lang")
    }
    // the fractional case really is fractional (not saturated either way)
    val (_, _, _, fr) = got("fr")
    assert(fr > 0 && fr < 1000000, s"fr rate_micros $fr should be uncapped")
    // qq's uncapped quotient exceeds int64 — the cap must happen in decimal
    val (qe, qr, qc, qRate) = got("qq")
    assert(halfAway(qe * qr * M, BigInt(8) * qc) > BigInt(Long.MaxValue))
    assert(qRate === M)
    // zero-clean guard
    assert(got("zz")._4 === M)
  }

  // For the fixpoint test, the capping language holds 5×10¹² clean
  // tokens (not ~0): caps engage and the fixpoint still converges to a
  // T* large enough that share·T stays past int64 — the collapse-to-
  // zero corner (clean ≈ 0 languages) is covered by the q114 test's
  // masses and doesn't stress the wide arithmetic.
  private val fixDocs = hugeDocs.filter(d => d._2 != "qq" && d._2 != "zz") :+
    ((7L, "qq", 90000000000000L, 5000000000000L))

  test("q120 water-filling fixpoint is exact at >=10^13-token masses (BigInt replay)") {
    val docs = docsOf(fixDocs)
    val masses = policy114(docs) // eighths/raw/clean per lang, Spark-derived
    val out = PipelineOps.q120PolicyOf(PipelineOps.q114PolicyOf(docs))
      .collect().map { r =>
        r.getAs[String]("lang") ->
          ((BigInt(r.getAs[Long]("share_micros")), BigInt(r.getAs[Long]("rate_micros")),
            BigInt(r.getAs[Long]("alloc_tokens"))))
      }.toMap

    // exact BigInt replay of the fixpoint
    val tw = masses.map { case (l, (e, raw, _, _)) => l -> e * raw }
    val tws = tw.values.sum
    val share = tw.map { case (l, w) => l -> halfAway(w * M, tws) }
    def alloc(l: String, t: BigInt): BigInt =
      masses(l)._3.min(halfAway(share(l) * t, M))
    var t = masses.values.map(_._3).sum
    for (_ <- 1 to PipelineOps.MixFixpointRounds)
      t = masses.keys.map(alloc(_, t)).sum

    masses.keys.foreach { l =>
      val (gShare, gRate, gAlloc) = out(l)
      val a = alloc(l, t)
      val clean = masses(l)._3
      val rate = if (clean == 0) M else M.min(halfAway(a * M, clean))
      // every lang's share numerator tw·10⁶ wraps int64; for the
      // dominant language share·T does too (asserted below) — the
      // decimal path is load-bearing in BOTH divisions
      assert(tw(l) * M > BigInt(Long.MaxValue), s"lang $l regime")
      assert(gShare === share(l), s"share $l")
      assert(gAlloc === a, s"alloc $l")
      assert(gRate === rate, s"rate $l")
    }
    assert(share("en") * t > BigInt(Long.MaxValue),
      "dominant language's share·T must exceed int64")
    // water-filling actually engaged: qq caps (alloc = clean < share·T)
    assert(out("qq")._3 === masses("qq")._3)
    assert(out("qq")._2 === M)
  }

  test("decimal lattice is bit-identical to exact arithmetic at in-range masses") {
    // masses well inside int64 — the regime every test-SF oracle hash
    // was minted in; the lift must be invisible here
    val small = Seq(
      (1L, "en", 52341L, 38012L), (2L, "en", 41007L, 29990L),
      (3L, "de", 30555L, 30555L), (4L, "fr", 20123L, 9061L),
      (5L, "qq", 777L, 0L))
    val docs = docsOf(small)
    val p114 = PipelineOps.q114PolicyOf(docs)
    // schema narrowed back to long — no decimal leaks into consumers
    Seq("rate_micros").foreach(c =>
      assert(p114.schema(c).dataType === LongType, s"q114 $c type"))
    policy114(docs).foreach { case (lang, (e, raw, clean, rate)) =>
      assert(e * raw * M <= BigInt(Long.MaxValue)) // genuinely in-range
      assert(rate === rate114(e, raw, clean), s"lang $lang")
    }
    val p120 = PipelineOps.q120PolicyOf(p114)
    Seq("share_micros", "rate_micros", "alloc_tokens").foreach(c =>
      assert(p120.schema(c).dataType === LongType, s"q120 $c type"))
    assert(p120.count() === 4)
  }
}
