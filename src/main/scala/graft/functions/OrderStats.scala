package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics without a global sort.
  *
  * Spark executes an unpartitioned `Window.orderBy` as a sort of the
  * ENTIRE input in one task — fine at sf0.1, a single-executor corpus
  * sort at 100 TB. This helper finds the key at any global rank using
  * only aggregate-shaped jobs:
  *
  *   1. histogram the value into [[NumBins]] fixed-width bins
  *      (corpus pass #1: a groupBy on the bin id → ≤ NumBins rows);
  *   2. a cumulative count over the bins locates the bin holding each
  *      requested rank (the only unpartitioned window, over ≤ NumBins
  *      rows that have already collapsed through an Aggregate);
  *   3. a narrow second pass re-scans only the located bins and picks
  *      the exact boundary key out of a per-bin sorted array.
  *
  * Worst case (all values equal → one bin holds everything) degrades to
  * a single-group sorted collect; for real score/price distributions the
  * target bin is ~|input|/NumBins. Ranks are 1-based under ascending
  * (v, id) lexicographic order — callers wanting descending order pass
  * a negated v.
  */
object OrderStats {
  val NumBins = 4096

  /** Keys at the requested global ranks of `df` ordered by (v asc, id asc).
    *
    * @param df      columns (v: double, id: long) — the ranked relation;
    *                (v, id) pairs must be unique (id a key)
    * @param targets columns (idx: tag, t: long 1-based rank); must be a
    *                tiny, broadcastable relation with 1 ≤ t ≤ count(df)
    * @return one row per target: (idx, t, v, id)
    */
  def keysAtRanks(df: DataFrame, targets: DataFrame): DataFrame = {
    val rng = df.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    def binOf(v: Column): Column =
      when(col("vmax") <= col("vmin"), lit(0L)).otherwise(
        least(floor((v - col("vmin")) / ((col("vmax") - col("vmin")) / NumBins)),
          lit(NumBins - 1L)).cast("long"))
    val binned = df.crossJoin(broadcast(rng))
      .select(col("v"), col("id"), binOf(col("v")).as("bin"))
    val bins = binned.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    val cum = bins.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // the bin containing rank t satisfies prior < t ≤ cum
    val located = targets.join(broadcast(cum),
        col("t") > col("cum") - col("cnt") && col("t") <= col("cum"))
      .select(col("idx"), col("t"), col("bin"),
        (col("cum") - col("cnt")).as("prior"))
    val needed = located.select(col("bin")).distinct()
    val arrs = binned.join(broadcast(needed), "bin")
      .groupBy(col("bin"))
      .agg(array_sort(collect_list(struct(col("v"), col("id")))).as("arr"))
    located.join(arrs, "bin")
      .select(col("idx"), col("t"),
        element_at(col("arr"), (col("t") - col("prior")).cast("int")).as("key"))
      .select(col("idx"), col("t"), col("key.v").as("v"), col("key.id").as("id"))
  }
}
