package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** The two missing seams around Spark's built-in `count_min_sketch`
  * aggregate (which emits a serialized
  * `org.apache.spark.util.sketch.CountMinSketch` binary but offers no
  * way to re-aggregate or query it in a plan):
  *
  *  - [[CmsUnion]] — merge stored per-shard sketch binaries into a
  *    coarser rollup, the `hll_union_agg` analogue. Partials merge
  *    associatively (cell-wise counter sums), so the shuffle carries
  *    one depth×width array per partition.
  *  - [[CmsEstimate]] — point frequency estimate of a string item
  *    against a sketch binary. CMS guarantees estimate ≥ true count,
  *    and ≤ true + ε·N with probability 1−δ (Cormode & Muthukrishnan
  *    2005).
  *
  * Together with HLL (distinct), SpaceSaving (top-k) and GK
  * (quantiles), this completes the mergeable-sketch family: build
  * per-shard frequency sketches once, store them as binary columns
  * beside the shard ([[graft.operators.Sketches]]' recipe), and answer
  * later "how often did X occur" rollups without rescanning.
  */
final class CmsBuffer(var sketch: CountMinSketch)

/** Union aggregate over serialized CountMinSketch binaries. All input
  * sketches must share depth/width/seed (the built-in aggregate's
  * eps/confidence/seed arguments) — CountMinSketch.mergeInPlace throws
  * on shape mismatch, surfacing config drift instead of corrupting
  * estimates.
  */
case class CmsUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  // wrong-typed SQL arguments (graft_fn registration) must fail at
  // analysis, not as an executor-side ClassCastException
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_union"

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(null)

  private def readSketch(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = readSketch(v.asInstanceOf[Array[Byte]])
      if (buffer.sketch == null) buffer.sketch = s
      else buffer.sketch.mergeInPlace(s)
    }
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    if (other.sketch != null) {
      if (buffer.sketch == null) buffer.sketch = other.sketch
      else buffer.sketch.mergeInPlace(other.sketch)
    }
    buffer
  }

  override def eval(buffer: CmsBuffer): Any =
    if (buffer.sketch == null) null
    else {
      val baos = new java.io.ByteArrayOutputStream()
      buffer.sketch.writeTo(baos)
      baos.toByteArray
    }

  override def serialize(buffer: CmsBuffer): Array[Byte] =
    if (buffer.sketch == null) Array.emptyByteArray
    else {
      val baos = new java.io.ByteArrayOutputStream()
      buffer.sketch.writeTo(baos)
      baos.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    if (bytes.isEmpty) new CmsBuffer(null)
    else new CmsBuffer(readSketch(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsUnion =
    copy(child = newChildren.head)
}

/** `cms_estimate(sketch binary, item string) → long`. Deserializes the
  * sketch per ROW (CodegenFallback) — the intended shape is a HANDFUL
  * of probe rows against an already-merged sketch (explode the probe
  * list, cross-join the 1-row sketch), never a corpus-sized probe; for
  * that, join the corpus against an exact count table instead. Items
  * are matched by their UTF-8 bytes — the same hashing the built-in
  * aggregate applied to string columns.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(sketch: Any, item: Any): Any = {
    val s = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch.asInstanceOf[Array[Byte]]))
    s.estimateCount(item.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsSketch {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** Column wrapper for [[CmsUnion]] (an aggregate — use in `agg`). */
  def cms_union(sketch: Column): Column =
    GraftBridge.column(
      CmsUnion(GraftBridge.expression(sketch)).toAggregateExpression())

  /** Column wrapper for [[CmsEstimate]]. */
  def cms_estimate(sketch: Column, item: Column): Column =
    GraftBridge.column(
      CmsEstimate(GraftBridge.expression(sketch), GraftBridge.expression(item)))
}
