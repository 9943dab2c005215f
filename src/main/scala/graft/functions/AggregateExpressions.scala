package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native Catalyst
  * TypedImperativeAggregate — the mergeable frequent-items sketch Spark has
  * no aggregate for (`df.stat.freqItems` is a driver-side helper, not an
  * aggregate expression).
  *
  * Semantics: at most `capacity` counters; an unseen item when full
  * decrements every counter (dropping zeros) instead of evicting one.
  * Guarantees, independent of partitioning/merge order:
  *   - any item with true frequency > n/(capacity+1) IS in the summary;
  *   - every reported count is a lower bound on the true count, short by
  *     at most n/(capacity+1).
  * When `capacity` ≥ the number of distinct items no decrement ever fires
  * and the summary degenerates to EXACT counts — which also makes it
  * deterministic and oracle-checkable on bounded-vocabulary fixtures.
  *
  * Scale shape: this is the point of the sketch — each task builds an
  * O(capacity) summary map-side, and the exchange carries one summary per
  * partition instead of one row per (group, item). The merge (counter sum,
  * then subtract the (capacity+1)-th largest and drop ≤ 0) preserves both
  * guarantees, so a 1000-executor fan-in costs capacity × partitions rows,
  * never vocabulary × partitions.
  *
  * Output: array<struct<item string, est long>> sorted by (est desc, item)
  * — a total order, so equal inputs give byte-equal results.
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries_topk needs a string item column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (reused) UTF8String backing buffer
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1L
        case None if buf.size < capacity => buf(s) = 1L
        case None =>
          // classic MG step: charge one to every counter, drop zeros
          buf.filterInPlace((_, c) => c > 1L)
          buf.mapValuesInPlace((_, c) => c - 1L)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop ≤ 0 —
      // the standard guarantee-preserving merge reduction
      val d = buf.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      buf.mapValuesInPlace((_, c) => c - d)
      buf.filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toSeq.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(entries.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf(in.readUTF()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
  override def prettyName: String = "misra_gries_topk"
}
