package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a named
  * DataFrame plan over a scale-factor directory, plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Op {
  /** DuckDB-side fragment of [[graft.functions.Num.dsum]]: exact decimal
    * sum surfaced as double — bit-identical to the Spark plan regardless
    * of partitioning / aggregation order.
    */
  def SUM_D(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  def AVG_D(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / COUNT($col)"
}
