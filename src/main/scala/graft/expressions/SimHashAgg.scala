package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 64-bit SimHash aggregate.
  *
  * Declarative SimHash needs 64 parallel `SUM(CASE WHEN bit THEN 1 ELSE
  * -1)` aggregates plus a 64-term assembly expression; this
  * TypedImperativeAggregate keeps one int[64] buffer per group and does
  * the bit loop imperatively — one aggregate instead of 64, one buffer
  * instead of 64 long columns, partial-merge friendly (buffers add), so
  * the map-side combine property is preserved at cluster scale.
  *
  * Inputs: two 32-bit token hashes (e.g. md5 word-halves as longs);
  * each input row contributes ±1 per bit — summing per occurrence IS the
  * tf-weighted sum. eval() assembles sign bits into the 64-bit sketch.
  */
case class SimHashAgg(
    hA: Expression,
    hB: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(hA, hB)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hA.dataType == LongType && hB.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (bigint, bigint)")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val a = hA.eval(input)
    val b = hB.eval(input)
    if (a != null && b != null) {
      val av = a.asInstanceOf[Long]
      val bv = b.asInstanceOf[Long]
      var j = 0
      while (j < 32) {
        buf(j) += (if (((av >> j) & 1L) == 1L) 1 else -1)
        buf(j + 32) += (if (((bv >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var h = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) h |= (1L << j)
      j += 1
    }
    h
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hA = newChildren(0), hB = newChildren(1))
}

object SimHashAgg {
  /** Aggregate column: 64-bit simhash of the (hA, hB) hash stream. */
  def simhash(hA: Column, hB: Column): Column =
    Bridge.column(
      SimHashAgg(Bridge.expression(hA), Bridge.expression(hB))
        .toAggregateExpression())
}
