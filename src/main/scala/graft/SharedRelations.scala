package graft

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Group-lifetime memo for relations that several operators in one
  * family re-derive from scratch — the dedup family's verified pair
  * sets (q50's MinHash pairs feed q74/q91/q94/q95/q97/q99), the
  * connected-component label sets, and the PageRank vector.
  *
  * Why the CacheManager can't do this: those relations are built
  * through `localCheckpoint()` (iterative fixpoints and
  * action-embedding builds MUST truncate lineage), and every invocation
  * manufactures a fresh `LogicalRDD`, so two builds of the same
  * relation are never structurally equal and `.cache()`'s
  * structural-match reuse never fires. The memo keys by (relation,
  * data dir) instead and hands every consumer the SAME materialized
  * DataFrame.
  *
  * Entries are materialized via `localCheckpoint()` at build time, so a
  * memoized plan is lineage-free: the per-op
  * [[CheckpointRegistry.releaseAll]] in Bench/Verify (which frees the
  * builder's own intermediate blocks) cannot strand it. The memo owns
  * its blocks; [[clear]] releases them at the op-family boundary —
  * Bench/Verify call it next to `spark.catalog.clearCache()`, specs via
  * the suite teardown in SharedSpark. Library users outside the harness
  * hold at most one pair-set-sized block set per (relation, dir) until
  * they call [[clear]] — pair sets are ∝ true duplicates, label/rank
  * sets one row per doc id, both ≪ corpus.
  *
  * At 100 TB this is the difference between running the
  * signature→band→verify pipeline once per curation readout (6× in a
  * full dedup report) and once per corpus snapshot.
  */
object SharedRelations {

  private final case class Entry(df: DataFrame, blocks: Seq[RDD[_]])
  private val memo = mutable.LinkedHashMap.empty[(String, String), Entry]

  /** Return the memoized relation for (key, dir), building and
    * materializing it on first request. Single-JVM scope (one session
    * per harness/test run); the build runs inside the lock, which is
    * correct for the sequential harness loops and prevents a concurrent
    * double-build.
    *
    * LOAD-BEARING single-threaded constraint (r4 ADVICE): the whole
    * multi-minute build executes while holding this object's monitor,
    * and NESTED getOrBuild calls (q95 → pairs50) rely on reentrant
    * locking plus LinkedHashMap.getOrElseUpdate tolerating
    * self-insertion during the default thunk. Safe under the harness's
    * sequential loops; a future multi-threaded consumer must switch to
    * a per-key future/latch so the lock only guards map mutation (and
    * unrelated families' builds stop serializing). */
  def getOrBuild(key: String, dir: String)(build: => DataFrame): DataFrame =
    synchronized {
      memo.getOrElseUpdate((key, dir), {
        val ck = build.localCheckpoint()
        val blocks = ck.queryExecution.analyzed.collect {
          case l: LogicalRDD => l.rdd
        }
        Entry(ck, blocks)
      }).df
    }

  /** The memoized relation for (key, dir) if it is already built —
    * never runs a build, never blocks on one (beyond the map-mutation
    * monitor). Lets a caller whose build closure must take ANOTHER lock
    * check the memo first and take that lock OUTSIDE this object's
    * monitor (r16 ADVICE: q204's routed-mapping build called the
    * BpeOps-synchronized q204Ensure from inside getOrBuild — the
    * opposite acquisition order to a direct q204Ensure call). */
  def peek(key: String, dir: String): Option[DataFrame] = synchronized {
    memo.get((key, dir)).map(_.df)
  }

  /** Drop every memoized relation and unpersist its blocks. Call only
    * at a point where no consumer will re-execute a plan that read a
    * memoized relation (the family boundary in Bench/Verify, suite
    * teardown in tests) — the blocks are those plans' only source. */
  def clear(): Unit = synchronized {
    memo.valuesIterator.foreach(_.blocks.foreach(_.unpersist(blocking = false)))
    memo.clear()
  }
}
