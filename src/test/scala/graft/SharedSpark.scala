package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

trait SharedSpark { self: Suite =>
  lazy val spark: SparkSession = SharedSpark.session
  /** Smallest scale factor — specs assert semantics, not throughput. */
  val SF = "/root/testdata/sf0.001"
}

object SharedSpark {
  lazy val session: SparkSession = GraftSession.local(cores = 4, shufflePartitions = 4)
}
