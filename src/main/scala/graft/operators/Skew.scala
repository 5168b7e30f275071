package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join split handles most hot keys at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in
  * [[graft.GraftSession]]); explicit salting remains the tool when one
  * key dominates so hard that even split partitions hot-spot, or when
  * the build side must stay a shuffle join. The frequent-shingle cap in
  * [[DedupOps.q49]] is the same idea applied to an inverted index.
  */
object Skew {

  /** Join `big` (skewed on `key`) against `small` by scattering each big
    * row to one of `salts` sub-keys and replicating the small side
    * `salts`×. Result equals `big.join(small, key)` exactly (SkewSpec);
    * the hot key's rows spread over `salts` reducers instead of one.
    *
    * The salt is derived from `spark_partition_id` + a per-row monotonic
    * id — deterministic-enough scatter with zero extra columns read.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol: Column = pmod(hash(monotonically_increasing_id()), lit(salts))
    val bigS = big.withColumn("__salt", saltCol)
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
