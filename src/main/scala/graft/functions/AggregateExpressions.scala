package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

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
  * Accepts string items (tokens, URLs) and long items (user/entity ids —
  * the canonical heavy-hitter input in an events table); the summary's
  * `item` field carries the child's type through.
  *
  * Scale shape: this is the point of the sketch — each task builds an
  * O(capacity) summary map-side, and the exchange carries one summary per
  * partition instead of one row per (group, item). The merge (counter sum,
  * then subtract the (capacity+1)-th largest and drop ≤ 0) preserves both
  * guarantees, so a 1000-executor fan-in costs capacity × partitions rows,
  * never vocabulary × partitions.
  *
  * Serialization is length-prefixed raw UTF-8 (`writeInt(len); write(bytes)`)
  * — NOT `DataOutputStream.writeUTF`, whose modified-UTF-8 format caps a
  * single item at 65,535 bytes and throws `UTFDataFormatException` past it.
  * Heavy-hitters over raw web text is exactly where a pathological >64 KB
  * "token" (an unbroken binary blob that survives whitespace tokenization)
  * eventually appears, and one such item must not fail the aggregation at
  * shuffle time.
  *
  * Output: array<struct<item <child type>, est long>> sorted by
  * (est desc, item) — a total order, so equal inputs give byte-equal
  * results.
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  private def isString: Boolean = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries_topk needs a string or bigint item column, got $other")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long],
                      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // strings: copy out of the (reused) UTF8String backing buffer;
      // longs box to a stable java.lang.Long key
      val k: Any = v match {
        case s: UTF8String => s.toString
        case other => other
      }
      buf.get(k) match {
        case Some(c) => buf(k) = c + 1L
        case None if buf.size < capacity => buf(k) = 1L
        case None =>
          // classic MG step: charge one to every counter, drop zeros
          buf.filterInPlace((_, c) => c > 1L)
          buf.mapValuesInPlace((_, c) => c - 1L)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
                     other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
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

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val entries =
      if (isString)
        buf.toSeq.sortBy { case (k, c) => (-c, k.asInstanceOf[String]) }
      else
        buf.toSeq.sortBy { case (k, c) => (-c, k.asInstanceOf[Long]) }
    new GenericArrayData(entries.map { case (k, c) =>
      val item: Any = k match {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
      InternalRow(item, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    if (isString) {
      buf.foreach { case (k, c) =>
        val b = k.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
        out.writeInt(b.length)
        out.write(b)
        out.writeLong(c)
      }
    } else {
      buf.foreach { case (k, c) =>
        out.writeLong(k.asInstanceOf[Long]); out.writeLong(c)
      }
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    if (isString) {
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf(new String(b, StandardCharsets.UTF_8)) = in.readLong()
        i += 1
      }
    } else {
      while (i < n) { buf(in.readLong()) = in.readLong(); i += 1 }
    }
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
