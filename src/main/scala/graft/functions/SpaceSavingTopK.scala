package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters buffer for [[SpaceSavingTopK]]: item → (count, error),
  * bounded at `capacity` entries (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams").
  */
final class SpaceSavingBuffer(val capacity: Int) {
  val entries: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  def add(item: String, count: Long = 1L, error: Long = 0L): Unit =
    entries.get(item) match {
      case Some((c, e)) => entries.update(item, (c + count, e + error))
      case None if entries.size < capacity => entries.update(item, (count, error))
      case None =>
        // evict the minimum-count entry; the newcomer inherits its count
        // as an upper bound (classic SpaceSaving: count=min+new, error=min)
        val (minItem, (minC, _)) = entries.minBy { case (k, (c, _)) => (c, k) }
        entries.remove(minItem)
        entries.update(item, (minC + count, minC + error))
    }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12): sum counts
    * and errors for common items, keep singletons, then trim to the
    * `capacity` largest counts.
    */
  def mergeIn(other: SpaceSavingBuffer): Unit = {
    other.entries.foreach { case (item, (c, e)) =>
      entries.get(item) match {
        case Some((c0, e0)) => entries.update(item, (c0 + c, e0 + e))
        case None           => entries.update(item, (c, e))
      }
    }
    if (entries.size > capacity) {
      val keep = entries.toSeq
        .sortBy { case (item, (c, _)) => (-c, item) }
        .take(capacity)
      entries.clear()
      entries ++= keep
    }
  }
}

/** SpaceSaving top-k heavy hitters as a `TypedImperativeAggregate` — the
  * custom-aggregate seam SURVEY §7.4 reserved for sketches. Answers
  * "most frequent tokens/domains/langs over 100 TB" in ONE pass with a
  * bounded `capacity`-entry buffer per partial: no groupBy over the full
  * item domain, map-side partials merge associatively, and the shuffle
  * carries one small buffer per partition instead of per-item rows.
  *
  * Returns `array<struct<item string, count long, error long>>` of the
  * `k` largest estimated counts (count is an overestimate by at most
  * `error`; items with true count > N/capacity are guaranteed present).
  * Spark's built-in `count_min_sketch` answers point lookups but cannot
  * enumerate heavy hitters; this fills that hole.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  def this(child: Expression, k: Int) = this(child, k, math.max(8 * k, 64))

  require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count", LongType),
    StructField("error", LongType))), containsNull = false)
  override def prettyName: String = "space_saving_top_k"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any = {
    val top = buffer.entries.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = new DataOutputStream(baos)
    out.writeInt(buffer.capacity)
    out.writeInt(buffer.entries.size)
    buffer.entries.foreach { case (item, (c, e)) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    baos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      val c = in.readLong(); val e = in.readLong()
      buf.entries.update(new String(b, "UTF-8"), (c, e))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
}
