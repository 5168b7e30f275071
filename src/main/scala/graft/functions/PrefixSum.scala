package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed prefix sums without a global single-task window.
  *
  * `sum(v).over(Window.orderBy(...))` with no partition spec sorts the
  * ENTIRE relation in one task — the same scale-killer
  * [[OrderStats]] removes for order statistics, here for running
  * totals. The classic two-level scan instead:
  *
  *   1. bin the (long) ordering key into [[NumBins]] fixed-width
  *      buckets — one aggregate pass gives each bin's sum;
  *   2. a cumulative window over the ≤ [[NumBins]] AGGREGATED bin rows
  *      (tiny — the only unpartitioned window, satisfying the
  *      ScalePlanSpec rule) yields each bin's starting offset;
  *   3. a PARTITIONED window (one partition per bin, all parallel)
  *      computes local running sums, shifted by the broadcast offset.
  *
  * Bin population ~n/NumBins when the key is hash-distributed — the
  * intended contract (callers order by an md5-derived key, e.g. the
  * q82 shuffle_key). A point-mass key degrades that bin's local window
  * to one task, exactly like any skewed partitioned window.
  */
object PrefixSum {
  val NumBins = 4096

  /** Adds `outCol` = Σ `v` over rows ordered ≤ (bkey, tiebreak...) —
    * an INCLUSIVE running total under exact long arithmetic.
    *
    * @param df       input; every listed column must exist
    * @param bkey     long ordering key, leading sort component; should be
    *                 well-spread (hash-derived) — bins are fixed-width
    * @param tiebreak remaining sort components making the order total
    * @param v        long value column to accumulate
    */
  def withRunningSum(df: DataFrame, bkey: String, tiebreak: Seq[String],
      v: String, outCol: String, span: Option[(Long, Long)] = None): DataFrame =
    withRunningSums(df, bkey, tiebreak, Seq(v -> outCol), span)

  /** [[withRunningSum]] for SEVERAL value columns in ONE two-level scan
    * (one binning pass, one bin-offset window, one partitioned local
    * window) — a caller needing rank AND a cumulative flag count (q133)
    * pays the scan once instead of per column.
    *
    * `span`: when the caller KNOWS the key range statically (every
    * md5-derived key here is a fixed bit-width — 60-bit hashes, the
    * epoch/bucket folds), pass `(lo, hi)` and the range-probe aggregate
    * (one extra job + a broadcast per call) is skipped: the bin width
    * computes at the driver. Correctness does not depend on the span
    * being tight — a key outside it still bins monotonically (the bin
    * formula extends linearly); a loose span only wastes bins. */
  def withRunningSums(df: DataFrame, bkey: String, tiebreak: Seq[String],
      vs: Seq[(String, String)], span: Option[(Long, Long)] = None): DataFrame = {
    // intermediates (__bsum_$v/__off_$v) are keyed by SOURCE column name,
    // so the same source listed twice would collide into ambiguous
    // columns mid-plan — fail at the API boundary with the real cause
    require(vs.map(_._1).distinct.size == vs.size,
      s"PrefixSum.withRunningSums: duplicate source value columns in " +
        s"${vs.map(_._1).mkString("[", ", ", "]")}; alias the column and " +
        "list each source once")
    val binned = span match {
      case Some((lo, hi)) =>
        // static span: width at the driver, no range-probe job. The
        // overflow guard is a plain driver-side check here (Math.
        // subtractExact throws the same named condition the in-plan
        // assert raises on the dynamic path).
        require(hi >= lo, s"PrefixSum: static span ($lo, $hi) inverted")
        val width =
          try Math.subtractExact(hi, lo) / NumBins + 1L
          catch { case _: ArithmeticException => throw new IllegalArgumentException(
            s"PrefixSum: $bkey span exceeds Long.MaxValue") }
        df.withColumn("__bin", expr(s"($bkey - ${lo}L) div ${width}L"))
      case None =>
        val rng = df.agg(min(col(bkey)).as("lo"), max(col(bkey)).as("hi"))
        // exact integer bin: (bkey - lo) div width, width ≥ span/NumBins.
        // `hi - lo` overflows when the span exceeds Long.MaxValue (hi > 0,
        // lo < 0): ANSI mode raises an opaque ARITHMETIC_OVERFLOW from
        // whichever task hits it first, non-ANSI SILENTLY wraps and breaks
        // the bin↔order monotonicity the two-level scan depends on. Callers
        // use ≤ 60-bit hash keys, but the contract is enforced, not
        // assumed: try_subtract is NULL on overflow in BOTH modes, so the
        // assert_true guard raises the named error before the raw
        // subtraction can (coalesce(NULL-on-success, bin) keeps the type).
        val binExpr = expr(
          s"coalesce(assert_true(try_subtract(hi, lo) IS NOT NULL, " +
            s"'PrefixSum: $bkey span exceeds Long.MaxValue'), " +
            s"($bkey - lo) div (((hi - lo) div ${NumBins}L) + 1L))")
        df.crossJoin(broadcast(rng))
          .withColumn("__bin", binExpr).drop("lo", "hi")
    }
    val offsets = binned.groupBy(col("__bin"))
      .agg(vs.map { case (v, _) => sum(col(v)).as(s"__bsum_$v") }.head,
        vs.tail.map { case (v, _) => sum(col(v)).as(s"__bsum_$v") }: _*)
    val cum = Window.orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = vs.foldLeft(offsets) { case (d, (v, _)) =>
      d.withColumn(s"__off_$v",
        sum(col(s"__bsum_$v")).over(cum) - col(s"__bsum_$v"))
    }.select(col("__bin") +: vs.map { case (v, _) => col(s"__off_$v") }: _*)
    val local = Window.partitionBy(col("__bin"))
      .orderBy((col(bkey) +: tiebreak.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vs.foldLeft(binned.join(broadcast(offs), "__bin")) {
      case (d, (v, outCol)) =>
        d.withColumn(outCol, sum(col(v)).over(local) + col(s"__off_$v"))
    }.drop("__bin" +: vs.map { case (v, _) => s"__off_$v" }: _*)
  }
}
