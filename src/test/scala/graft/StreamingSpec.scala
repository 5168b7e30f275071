package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Stream ≡ batch on complete input: each streaming pipeline, fed the
  * events table through MemoryStream, must agree with its batch shape in
  * [[Events]]. */
class StreamingSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def eventData: Seq[Event] =
    Tables.events(spark, SF)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq

  test("streaming windowed user counts ≡ batch q31") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(eventData)
    val q = StreamOps.windowedUserCounts(ms.toDF())
      .writeStream.format("memory").queryName("t_q31").outputMode("complete").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("t_q31")
      .select("win_start", "n_users").as[(String, Long)].collect().sortBy(_._1)
    val want = Events.q31(spark, SF)
      .select("win_start", "n_users").as[(String, Long)].collect().sortBy(_._1)
    assert(got === want)
  }

  test("streaming keep-first dedup ≡ batch q32") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(eventData)
    val q = StreamOps.dedupKeepFirst(ms.toDF())
      .writeStream.format("memory").queryName("t_q32").outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("t_q32")
      .select("user_id", "event_type", "event_id")
      .as[(Long, String, Long)].collect().toSet
    val want = Events.q32(spark, SF)
      .select("user_id", "event_type", "event_id")
      .as[(Long, String, Long)].collect().toSet
    assert(got === want)
  }

  test("stream-static dimension join enriches every event") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(eventData)
    val dims = Tables.nation(spark, SF)
    val q = StreamOps.enrichedEvents(ms.toDF(), dims)
      .writeStream.format("memory").queryName("t_enr").outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("t_enr")
    assert(got.count() === eventData.length)
    assert(got.filter(col("nation").isNull).count() === 0)
  }

  test("stateful session counting ≡ batch q28 session totals") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(eventData)
    val q = StreamOps.sessionCounts(ms.toDS())
      .writeStream.format("memory").queryName("t_q28").outputMode("update").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.table("t_q28")
      .groupBy("user_id").agg(max("n_sessions").as("n"))
      .as[(Long, Long)].collect().toMap
    val want = Events.q28(spark, SF)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }
}
