package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries frequent-items sketch (heavy-hitter candidates).
  *
  * One pass, k counters per aggregation buffer, partial-merge friendly:
  * update is the classic MG step (hit +1; miss inserts while room,
  * otherwise decrements every counter), merge sums two summaries and
  * re-caps by subtracting the (k+1)-th largest count (Agarwal et al.,
  * "Mergeable Summaries", PODS'12) — both preserve the MG guarantee
  *   exact − estimate ≤ n / (k+1)
  * so ANY item with true frequency > n/(k+1) is present in the final
  * summary regardless of partitioning. Estimates themselves are
  * partitioning-dependent (only the guarantee is deterministic), which
  * is why consumers ([[graft.operators.TextOps.q101]]) treat the sketch
  * as a CANDIDATE set and re-count candidates exactly: sketch pass +
  * bounded exact pass ⇒ deterministic heavy-hitter output with the
  * corpus's long tail never entering a shuffle.
  *
  * eval() returns map<string, long> of surviving items → lower-bound
  * estimates.
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "freq_items requires k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "freq_items_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly reused) UTF8String backing buffer
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all: drops one "vote" from k+1 distinct items
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key0, c) => if (c <= 0) dead += key0 }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything, drop ≤ 0 —
      // the summary-merge analogue of decrement-all
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val items = buf.toArray.sortBy(_._1) // stable map order for display
    ArrayBasedMapData(
      items.map(e => UTF8String.fromString(e._1): Any),
      items.map(e => e._2: Any))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val blobs = entries.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + blobs.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(blobs(i).length)
      bb.put(blobs(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val blob = new Array[Byte](bb.getInt())
      bb.get(blob)
      buf.update(new String(blob, StandardCharsets.UTF_8), bb.getLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object FreqItemsAgg {
  /** Aggregate column: MG frequent-items summary (item → estimate). */
  def freqItems(c: Column, k: Int): Column =
    Bridge.column(FreqItemsAgg(Bridge.expression(c), k).toAggregateExpression())
}
