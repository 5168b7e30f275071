package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Exact distributed order statistics without a global sort.
  *
  * Spark executes an unpartitioned `Window.orderBy` as a sort of the
  * ENTIRE input in one task — fine at sf0.1, a single-executor corpus
  * sort at 100 TB. This helper finds the key at any global rank using
  * only aggregate-shaped jobs, refined ADAPTIVELY from the driver
  * (AQE-style: each decision reads a ≤ 4096-row aggregate, never data):
  *
  *   1. one pass: global (count, min v, max v);
  *   2. one pass per refinement level: histogram the ACTIVE ranges
  *      (the bins the requested ranks landed in, while they hold more
  *      than `leafCap` rows) into 4096 fixed-width sub-bins — on the
  *      value while the range spans distinct values (each level shrinks
  *      the span 4096×), and on the UNIQUE id once the range is an
  *      exact point mass (heavy ties — id order IS (v, id) order there,
  *      and id-width halves 4096× per level, so both modes terminate).
  *      The per-level collect is ≤ 4096·|active| aggregated rows;
  *      well-behaved distributions take zero refinement levels;
  *   3. one final narrow pass sorted-collects only the located leaf
  *      bins (each ≤ `leafCap` rows BY CONSTRUCTION — the loop already
  *      counted them) and picks the boundary key per target.
  *
  * Refining only when a located bin is oversized is what keeps the
  * common case at three total passes — the fixed-level declarative
  * alternative pays every level on every input, which multiplies the
  * full upstream pipeline cost when `df` is a derived relation (and a
  * level that bins a multi-valued range by id would even break (v, id)
  * order). A 64-level guard throws rather than degrade toward the 2 GB
  * single-task collect wall (ADVICE r2; exercised in ScalePlanSpec
  * with a tiny cap).
  *
  * Ranks are 1-based under ascending (v, id) lexicographic order —
  * callers wanting descending order pass a negated v.
  */
object OrderStats {
  val NumBins = 4096

  /** Max rows a final per-leaf sorted collect may hold (one task sorts
    * this many (v, id) structs — far under the 2 GB array/row limit).
    * Bins above this refine another level instead. */
  val LeafCap = 8 * 1024 * 1024

  /** A surviving search range: rows with v ∈ [vlo, vhi] (and, once the
    * range is a point mass vlo == vhi, id ∈ [idlo, idhi]). The interval
    * test is exact membership because the bin function is monotone in
    * the binned coordinate, so bins partition it into ordered intervals. */
  private final case class Range(vlo: Double, vhi: Double,
      idlo: Long, idhi: Long, cnt: Long) {
    def pointMass: Boolean = vlo == vhi
    def pred: Column =
      if (pointMass)
        col("v") === lit(vlo) && col("id") >= lit(idlo) && col("id") <= lit(idhi)
      else col("v") >= lit(vlo) && col("v") <= lit(vhi)
  }

  /** One requested rank mid-search: `r` = the 1-based rank within `rng`. */
  private final case class Target(idx: Row, t: Long, r: Long, rng: Range)

  /** Keys at the requested global ranks of `df` ordered by (v asc, id asc).
    *
    * Eager in the driver-adaptive sense: the refinement decisions run as
    * small aggregate jobs when this is CALLED; the returned frame holds
    * only the final narrow leaf pass. `df` is scanned once per pass —
    * callers whose `df` is an expensive derived relation should cache it
    * around the call (see TextOps.screeningStatsOf for the
    * cache-then-unpersist pattern that avoids a session-lifetime leak).
    *
    * @param df      columns (v: double, id: long) — the ranked relation;
    *                (v, id) pairs must be unique (id a key)
    * @param targets columns (idx: tag, t: long 1-based rank); must be a
    *                tiny, broadcastable relation; targets with t outside
    *                [1, count(df)] are dropped (inner-join semantics)
    * @param leafCap override of [[LeafCap]] (tests exercise refinement
    *                with a tiny cap)
    * @param preGlob precomputed global stats of `df` — (count, min v,
    *                max v, min id, max id) — letting a caller that
    *                already aggregates over the ranked relation FUSE
    *                this helper's global pass into its own (one fewer
    *                job over an expensive derived relation; see
    *                TextOps.screeningStatsOf). Must describe `df`
    *                exactly — a stale count mislocates ranks.
    * @return one row per located target: (idx, t, v, id)
    */
  def keysAtRanks(df: DataFrame, targets: DataFrame,
      leafCap: Long = LeafCap,
      preGlob: Option[(Long, Double, Double, Long, Long)] = None): DataFrame = {
    require(leafCap >= 1, s"leafCap must be ≥ 1, got $leafCap")
    val spark = df.sparkSession
    val base = df.select(col("v"), col("id"))
    val outSchema = StructType(
      targets.schema("idx") +: StructField("t", LongType, nullable = false) +:
        Seq(StructField("v", DoubleType), StructField("id", LongType)))

    val glob: Row = preGlob match {
      case Some((n0, vlo, vhi, idlo, idhi)) => Row(n0, vlo, vhi, idlo, idhi)
      case None => base.agg(count(lit(1)), min(col("v")), max(col("v")),
        min(col("id")), max(col("id"))).head()
    }
    val n = glob.getLong(0)
    val wanted = targets.select(col("idx"), col("t").cast("long")).collect()
      .map(r => (r.get(0), r.getLong(1)))
      .filter { case (_, t) => t >= 1 && t <= n }
    if (wanted.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)

    val root = Range(glob.getDouble(1), glob.getDouble(2),
      glob.getLong(3), glob.getLong(4), n)
    var ts: Seq[Target] = wanted.map { case (idx, t) =>
      Target(Row(idx), t, t, root) }

    var level = 0
    while (ts.exists(_.rng.cnt > leafCap)) {
      level += 1
      if (level > 64) throw new IllegalStateException(
        s"OrderStats: ${ts.count(_.rng.cnt > leafCap)} range(s) still above " +
          s"leafCap=$leafCap after 64 refinement levels — should be impossible " +
          "(value spans shrink 4096× per level, then id spans do)")
      val active: IndexedSeq[Range] =
        ts.collect { case t if t.rng.cnt > leafCap => t.rng }.distinct.toIndexedSeq
      // one pass histograms every active range: label = which range a row
      // belongs to (ranges are disjoint), bin = 4096-way split inside it.
      // Long sub-bins use exact integer `div` — `/` on longs is double
      // division and ids may exceed 2^53.
      val label = active.zipWithIndex.foldLeft(lit(null).cast("int")) {
        case (acc, (r, i)) => when(r.pred, lit(i)).otherwise(acc) }
      val bin = active.zipWithIndex.foldLeft(lit(null).cast("long")) {
        case (acc, (r, i)) =>
          val b =
            if (r.pointMass) {
              // exact integer `div`: `/` on longs is double division and
              // ids may exceed 2^53
              val width = math.max(1L, ((r.idhi - r.idlo) >>> 12) + 1L)
              expr(s"(id - ${r.idlo}L) div ${width}L")
            } else {
              val w = (r.vhi - r.vlo) / NumBins
              if (w > 0)
                least(floor((col("v") - lit(r.vlo)) / lit(w)), lit(NumBins - 1L))
                  .cast("long")
              else {
                // span too small for a 4096-way double split (subnormal-
                // dense range): midpoint split — both halves provably
                // non-empty, distinct-value count halves per level, so the
                // 64-level guard is never reached
                val m = r.vlo + (r.vhi - r.vlo) / 2
                when(col("v") <= lit(m), lit(0L)).otherwise(lit(1L))
              }
            }
          when(col("lbl") === i, b).otherwise(acc) }
      val hist = base
        .withColumn("lbl", label).filter(col("lbl").isNotNull)
        .withColumn("bin", bin)
        .groupBy(col("lbl"), col("bin"))
        .agg(count(lit(1)).as("cnt"), min(col("v")).as("vlo"),
          max(col("v")).as("vhi"), min(col("id")).as("idlo"),
          max(col("id")).as("idhi"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (l, rows) => l -> rows.sortBy(_.getLong(1)) }
      ts = ts.map { t =>
        if (t.rng.cnt <= leafCap) t
        else {
          val bins = hist(active.indexOf(t.rng))
          // walk sub-bins in (v, id) order; rank r falls in the first bin
          // whose cumulative count reaches it
          var acc = 0L
          val it = bins.iterator
          var found: Target = null
          while (found == null && it.hasNext) {
            val b = it.next()
            val c = b.getLong(2)
            if (t.r <= acc + c)
              found = t.copy(r = t.r - acc, rng = Range(b.getDouble(3),
                b.getDouble(4), b.getLong(5), b.getLong(6), c))
            else acc += c
          }
          assert(found != null, s"rank ${t.r} not located in ${bins.size} sub-bins")
          found
        }
      }
    }

    // final narrow pass: sorted-collect only the leaf ranges (each counted
    // ≤ leafCap above), pick the boundary key per target
    val leaves = ts.map(_.rng).distinct.toIndexedSeq
    val leafLbl = leaves.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (r, i)) => when(r.pred, lit(i)).otherwise(acc) }
    val arrs = base
      .withColumn("leaf", leafLbl).filter(col("leaf").isNotNull)
      .groupBy(col("leaf"))
      .agg(array_sort(collect_list(struct(col("v"), col("id")))).as("arr"))
    val tgtRows = ts.map(t =>
      Row(t.idx.get(0), t.t, leaves.indexOf(t.rng), t.r))
    val tgtSchema = StructType(
      targets.schema("idx") +: StructField("t", LongType, nullable = false) +:
        Seq(StructField("leaf", org.apache.spark.sql.types.IntegerType, false),
          StructField("lr", LongType, false)))
    val tgt = spark.createDataFrame(
      spark.sparkContext.parallelize(tgtRows, 1), tgtSchema)
    // broadcast the tiny target side — a leaf array can hold leafCap structs
    arrs.join(broadcast(tgt), "leaf")
      .select(col("idx"), col("t"),
        element_at(col("arr"), col("lr").cast("int")).as("key"))
      .select(col("idx"), col("t"), col("key.v").as("v"), col("key.id").as("id"))
  }
}
