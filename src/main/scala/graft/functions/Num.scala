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
}
