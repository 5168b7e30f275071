package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric aggregation helpers.
  *
  * Double addition is not associative, so a shuffle-order-dependent
  * `sum(double)` differs in its low bits run-to-run AND engine-to-engine.
  * For oracle-checked outputs we do monetary arithmetic in DECIMAL (exact,
  * order-independent) and cast the final value to double — bit-identical
  * regardless of partitioning, and reproducible in any ANSI engine.
  */
object Num {
  private val D = DecimalType(18, 2)

  /** Column widened to DECIMAL(18,2). */
  def dec2(c: Column): Column = c.cast(D)

  /** Exact sum of a 2-decimal quantity, surfaced as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact sum of a product of 2-decimal quantities, as double. */
  def dsumProd(a: Column, b: Column): Column = sum(dec2(a) * dec2(b)).cast("double")

  /** Deterministic average: exact decimal sum divided (IEEE, one op) by count. */
  def davg(c: Column): Column = sum(dec2(c)).cast("double") / count(c)

  // --- boundary-free 6-decimal rounding of exact rationals (r4) ----------
  //
  // round(p/q, 6) on a DOUBLE is engine-ambiguous when the exact rational
  // p/q lands ON a .5e-6 boundary (q = 128 does it: 65/128 =
  // 0.5078125): Spark rounds the exact decimal expansion of the nearest
  // double, DuckDB rounds a scaled double — they can disagree exactly
  // there (bit q90 at sf0.1). For ratios of INTEGERS the boundary is
  // decidable exactly: compute ⌊p·10⁶/q⌉ half-away-from-zero in int64
  // and divide by 10⁶ for display. The result equals round(p/q, 6)
  // everywhere except exact boundaries, where it is the mathematically
  // correct half-away value on BOTH engines.

  /** Exact truncating division of non-negative longs: (a − a mod b) is
    * divisible by b, so the decimal division is exact — no double (2⁵³)
    * loss, no decimal-scale rounding. */
  private def idivPos(a: Column, b: Column): Column =
    ((a - a % b).cast(DecimalType(38, 0)) / b.cast(DecimalType(38, 0)))
      .cast("long")

  /** ⌊p/q⌉ half-away-from-zero in pure int64; q > 0, p any sign. */
  def idivHalfAway(p: Column, q: Column): Column = {
    val pl = p.cast("long")
    val ql = q.cast("long")
    val den = ql * 2
    when(pl >= 0, idivPos(pl * 2 + ql, den))
      .otherwise(-idivPos(-pl * 2 + ql, den))
  }

  /** DuckDB fragment of [[idivHalfAway]]. */
  def idivHalfAwaySql(p: String, q: String): String =
    s"(CASE WHEN ($p) >= 0 THEN (2 * ($p) + ($q)) // (2 * ($q)) " +
      s"ELSE -((-2 * ($p) + ($q)) // (2 * ($q))) END)"

  /** round(p/q, 6) via integer micros; q > 0, p any sign, both integral
    * (callers keep |p| ≤ ~4.6e12 so 2·p·10⁶ stays in int64). */
  def ratio6(p: Column, q: Column): Column =
    idivHalfAway(p.cast("long") * 1000000L, q) / 1000000.0

  /** DuckDB fragment of [[ratio6]] (p, q SQL expressions; q > 0). */
  def ratio6Sql(p: String, q: String): String =
    s"${idivHalfAwaySql(s"($p) * 1000000", q)} / 1000000.0"

  // --- DECIMAL(38,0) lattice for corpus-token-scaled products (r6) -------
  //
  // The int64 helpers above hold only while 2·p·10⁶ fits in int64 —
  // |p| ≲ 4.6×10¹²: fine for doc counts and per-doc ratios, NOT for
  // corpus TOKEN masses at the 100 TB design point (~2.5×10¹³ tokens ⇒
  // eighths·raw·10⁶ ≈ 2×10²⁰). These variants run the SAME half-away
  // formula on DECIMAL(38,0) — exact to 38 digits, order-independent,
  // bit-identical to the int64 form wherever both are in range
  // (MixDecimalSpec pins both properties, feeding ≥10¹³-token masses
  // against a BigInt driver replay). The DuckDB replays already promote
  // through HUGEINT (int128), so the oracle side needs no change.

  val Big: DecimalType = DecimalType(38, 0)

  /** Column widened to DECIMAL(38,0) — widen BEFORE multiplying, or the
    * int64 product overflows ahead of the division. */
  def big(c: Column): Column = c.cast(Big)

  /** Exact truncating division on DECIMAL(38,0): (a − a mod b) is
    * divisible by b, so the quotient is an integer Spark's decimal
    * divide represents exactly (≤32 integer digits at scale 6). */
  private def idivPosBig(a: Column, b: Column): Column =
    ((a - a % b) / b).cast(Big)

  /** ⌊p/q⌉ half-away-from-zero on DECIMAL(38,0); q > 0, p any sign.
    * [[idivHalfAway]] past the int64 bound. */
  def idivHalfAwayBig(p: Column, q: Column): Column = {
    val pb = big(p)
    val qb = big(q)
    val den = qb * lit(2)
    when(pb >= 0, idivPosBig(pb * lit(2) + qb, den))
      .otherwise(-idivPosBig(-pb * lit(2) + qb, den))
  }

  /** round(p/q, 6) via decimal micros — [[ratio6]] for numerators past
    * ~4.6×10¹² (e.g. corpus-wide token-occurrence counts). */
  def ratio6Big(p: Column, q: Column): Column =
    idivHalfAwayBig(big(p) * lit(1000000L), q).cast("double") / 1000000.0

  /** Half-away 6-decimal average of values already ON the 1e-6 lattice
    * (e.g. [[ratio6]] outputs): recover the integer micros, average in
    * int64. `micros` must be a pre-aggregated SUM of
    * `round(x·10⁶).cast(long)`; `n` the count. */
  def latticeAvg6(micros: Column, n: Column): Column =
    idivHalfAway(micros, n) / 1000000.0

  def latticeAvg6Sql(micros: String, n: String): String =
    s"${idivHalfAwaySql(micros, n)} / 1000000.0"
}
