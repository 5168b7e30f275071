package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Semi-join pruning via Spark's native bloom-filter expressions — the
  * same `BloomFilterAggregate` / `BloomFilterMightContain` pair the AQE
  * runtime-filter rule injects, driven explicitly where the optimizer
  * can't see the opportunity (our candidate sets come out of a distinct
  * over an exploded self-join, which defeats the injection heuristics).
  *
  * The pattern: a corpus-sized relation is equi-joined to a small-but-
  * not-tiny key set (too big to broadcast-join comfortably, far smaller
  * than the corpus). A ~1 MiB serialized bloom of the keys ships in the
  * task binary and filters the corpus MAP-SIDE, so the join's shuffle
  * carries only probable matches. False positives cost shuffled rows,
  * never correctness — the join key stays exact downstream.
  *
  * Both sides hash through `xxhash64`, matching insert and probe. The
  * build is an eager driver action (the sketch is driver-sized by
  * construction), same driver-adaptive pattern as
  * [[OrderStats.keysAtRanks]].
  */
object BloomPrune {

  /** Sketch size is ~10 bits per expected key (≈1% fpp), floored at
    * 8 KiB and capped at 8 MiB: the serialized sketch ships as a plan
    * LITERAL in the task binary — once per referencing operator — so an
    * oversized default taxes every stage that mentions it (measured:
    * a fixed 1 MiB sketch on a 500-key candidate set doubled q50), and
    * an uncapped one would break task shipping outright. Past the cap
    * the fpp (pruning efficiency, not correctness) degrades gracefully. */
  def bitsFor(expectedItems: Long): Long =
    math.min(1L << 26, math.max(1L << 16, 10L * expectedItems))

  /** Serialized bloom filter over `keys.col(c)` (hashed via xxhash64).
    * Returns None for an empty key set (callers then prune to nothing). */
  def build(keys: DataFrame, c: String, expectedItems: Long): Option[Array[Byte]] = {
    val numBits = bitsFor(expectedItems)
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(keys.select(Bridge.column(agg)).head().getAs[Array[Byte]](0))
  }

  /** Map-side membership probe against a built sketch. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType), Bridge.expression(xxhash64(c))))

  /** `df` reduced to rows whose `c` might be in `keys.col(keyCol)` —
    * a bloom semi-join: a superset of the exact semi-join (no false
    * negatives), so an exact equi-join downstream is unaffected.
    * `expectedItems` should come from a real count of the (materialized)
    * key set — it sizes the sketch the task binary carries. */
  def semiPrune(df: DataFrame, c: String, keys: DataFrame, keyCol: String,
      expectedItems: Long): DataFrame =
    build(keys, keyCol, expectedItems) match {
      case Some(b) => df.filter(mightContain(b, col(c)))
      case None    => df.filter(lit(false))
    }
}
