package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded exact top-k buffer for [[GroupTopK]]: at most `k`
  * (key, id) entries under the total order (key desc, id asc). Linear
  * worst-slot replacement — k is small by contract (a ranking cut,
  * not a sort), so O(k) per insert beats heap bookkeeping.
  */
final class TopKBuffer(val k: Int) {
  val entries: mutable.ArrayBuffer[(Double, Long)] = mutable.ArrayBuffer.empty

  /** a strictly outranks b under (key desc, id asc). */
  @inline private def outranks(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def add(key: Double, id: Long): Unit =
    if (!key.isNaN) {
      val e = (key, id)
      if (entries.length < k) entries += e
      else {
        var worst = 0
        var i = 1
        while (i < entries.length) {
          if (outranks(entries(worst), entries(i))) worst = i
          i += 1
        }
        if (outranks(e, entries(worst))) entries(worst) = e
      }
    }

  def mergeIn(other: TopKBuffer): Unit =
    other.entries.foreach { case (key, id) => add(key, id) }

  def sorted: Seq[(Double, Long)] =
    entries.sortWith(outranks).toSeq
}

/** EXACT per-group top-k as a mergeable `TypedImperativeAggregate` —
  * the scale-safe alternative to `row_number() OVER (PARTITION BY g
  * ORDER BY key DESC) <= k`, which funnels every row of the hottest
  * group through ONE task's sort (the same trap
  * [[graft.operators.Quantiles.exactMedianByGroup]] closes for
  * medians, and `TakeOrderedAndProject` closes globally in
  * [[graft.operators.Bm25.topK]]). Here each map-side partial keeps at
  * most k entries PER GROUP, partials merge associatively, and the
  * exchange carries ≤ k rows of state per (group, partition) — no
  * sort, no window, and a skewed group costs what a balanced one does.
  *
  * Exactness (not a sketch): top-k under a TOTAL order — (key desc,
  * id asc), ties broken by the id — is decomposable: the top-k of a
  * union is contained in the union of per-part top-ks. Deterministic
  * by construction, so results hash-match an engine ranking with the
  * same order (q82's DuckDB oracle). NaN keys are excluded (SQL null
  * semantics); -Infinity ranks last among reals.
  *
  * Returns `array<struct<key double, id long>>` sorted best-first.
  */
case class GroupTopK(
    keyExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, "need k >= 1")

  override def children: Seq[Expression] = Seq(keyExpr, idExpr)

  // analysis-time validation (the CmsSketch rule): wrong-typed SQL
  // arguments must not surface as executor-side cast failures
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okKey = keyExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
      case _ => false
    }
    val okId = idExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (okKey && okId) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"group_top_k requires (numeric key, integral id), got " +
        s"(${keyExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", DoubleType),
    StructField("id", LongType))), containsNull = false)
  override def prettyName: String = "group_top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val kv = keyExpr.eval(input)
    val iv = idExpr.eval(input)
    if (kv != null && iv != null)
      buffer.add(kv.asInstanceOf[Number].doubleValue(),
        iv.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(
      buffer.sorted.map { case (key, id) => InternalRow(key, id) }.toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = new DataOutputStream(baos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.entries.length)
    buffer.entries.foreach { case (key, id) =>
      out.writeDouble(key); out.writeLong(id)
    }
    out.flush()
    baos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.entries += ((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GroupTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GroupTopK =
    copy(keyExpr = newChildren.head, idExpr = newChildren(1))
}
