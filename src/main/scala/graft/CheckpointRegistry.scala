package graft

import org.apache.spark.rdd.RDD

/** Ownership registry for localCheckpoint blocks that outlive their
  * operator ([[operators.DedupOps.connectedComponents]]'s final round).
  *
  * A localCheckpoint's blocks are NOT CacheManager entries, so the
  * group-level `spark.catalog.clearCache()` in Bench/Verify cannot free
  * them; without an explicit owner each invocation leaks one
  * corpus-sized label snapshot per run (best-of-2 benching of q70, q74
  * and q77 would pin up to six). Operators register the blocks that back
  * their RETURNED plan here; the harness (and specs) call [[releaseAll]]
  * after the consuming count/write completes, in the same breath as the
  * family cache clear.
  */
object CheckpointRegistry {
  private val live = scala.collection.mutable.ArrayBuffer.empty[RDD[_]]

  def register(rdd: RDD[_]): Unit = synchronized { live += rdd }

  /** Unpersist every registered block set. Safe to call repeatedly; only
    * call once no consumer will re-execute the registered plans (their
    * lineage is truncated to these blocks — they cannot recompute). */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = false))
    live.clear()
  }
}
