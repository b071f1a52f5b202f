package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV / theta distinct-cardinality sketches (Bar-Yossef et al. 2002;
  * Beyer et al. SIGMOD 2007; the Dasgupta et al. theta-sketch
  * framework): keep the k MINIMUM distinct 64-bit hash values of a
  * stream. The k-th minimum, normalized to (0,1], estimates the
  * "density" of distinct hashes, giving `D ≈ (k−1)/u_k` with relative
  * standard error ~ 1/√(k−2). What HLL (the existing distinct
  * sketch, q29/q34/q70) cannot do — and the reason this completes the
  * sketch family (HLL distinct, CMS frequency, SpaceSaving top-k, GK
  * quantiles) — is SET ALGEBRA: two KMV sketches intersect by
  * clipping both to the smaller theta and counting common values, so
  * stored per-shard sketches answer `|A ∩ B|` / `|A ∪ B|` overlap
  * questions (the [[graft.operators.CorpusOverlap]] estimates at
  * 100 TB) without rescanning either side.
  *
  * Mergeable by construction: union of two sketches = k smallest of
  * the value multiset union — associative and commutative, so
  * map-side partials combine exactly like the corpus-wide fit
  * (sharded union ≡ whole-corpus, spec-pinned byte-identical).
  * Sketches with n < k values are EXACT (every distinct hash is
  * present), a property the specs pin.
  *
  * Values are `XXH64(utf8 bytes, seed 0)` — the same hash space as
  * [[HashedSet]] — compared in UNSIGNED order. Binary layout:
  * `[k:int][n:int][n longs, unsigned-ascending]`.
  */
object Kmv {
  val HashSpace: Double = 18446744073709551616.0 // 2^64

  def hash(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 0L)

  /** Unsigned-order-preserving map to a signed long. */
  @inline def toSigned(h: Long): Long = h ^ Long.MinValue

  /** Normalized position of a hash in the unsigned 2^64 space, in
    * (0, 1]: the k-th minimum's u is the estimator's theta. +1 keeps
    * u strictly positive (hash 0 would otherwise divide by zero). */
  def u(h: Long): Double =
    ((toSigned(h).toDouble / HashSpace) + 0.5) + (1.0 / HashSpace)

  def serialize(k: Int, values: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * values.length)
    bb.putInt(k); bb.putInt(values.length)
    values.foreach(bb.putLong)
    bb.array()
  }

  /** (k, unsigned-ascending values). */
  def deserialize(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getInt
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) { vs(i) = bb.getLong; i += 1 }
    (k, vs)
  }

  /** Distinct-count estimate: exact n while n < k, else (k−1)/u_k. */
  def estimate(k: Int, values: Array[Long]): Double =
    if (values.length < k) values.length.toDouble
    else (k - 1).toDouble / u(values(k - 1))

  /** Theta-sketch intersection estimate: clip both to
    * theta = min(theta_a, theta_b), count common values below it,
    * estimate |A∩B| ≈ n_common / theta. Exact when both sides are
    * exact (n < k). */
  def intersectEstimate(ka: Int, a: Array[Long], kb: Int, b: Array[Long]): Double = {
    val thetaA = if (a.length < ka) 1.0 else u(a(ka - 1))
    val thetaB = if (b.length < kb) 1.0 else u(b(kb - 1))
    val theta = math.min(thetaA, thetaB)
    var i = 0; var j = 0; var common = 0
    while (i < a.length && j < b.length) {
      val x = toSigned(a(i)); val y = toSigned(b(j))
      if (x == y) {
        if (u(a(i)) <= theta) common += 1
        i += 1; j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    common.toDouble / theta
  }
}

final class KmvBuffer(val k: Int) {
  // unsigned-ascending distinct hash values, bounded at k
  val set = new java.util.TreeSet[java.lang.Long](
    new java.util.Comparator[java.lang.Long] {
      def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  def add(h: Long): Unit = {
    set.add(h)
    if (set.size > k) set.pollLast()
  }

  def addAll(vs: Array[Long]): Unit = { var i = 0; while (i < vs.length) { add(vs(i)); i += 1 } }

  def toArray: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** `kmv_sketch(item string, k) → binary` — build a KMV sketch of the
  * distinct items of a group. */
case class KmvAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with ExpectsInputTypes {

  require(k >= 2, "kmv_sketch needs k >= 2")
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(Kmv.hash(v.asInstanceOf[UTF8String]))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.addAll(other.toArray); buffer
  }

  override def eval(buffer: KmvBuffer): Any =
    Kmv.serialize(k, buffer.toArray)

  override def serialize(buffer: KmvBuffer): Array[Byte] =
    Kmv.serialize(k, buffer.toArray)

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val (kk, vs) = Kmv.deserialize(bytes)
    val b = new KmvBuffer(kk); b.addAll(vs); b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}

/** `kmv_union(sketch binary) → binary` — re-aggregate stored sketches
  * into a coarser rollup (k = the MIN of the inputs' k: a union is
  * only a valid KMV sketch at the smallest k seen, since values past
  * the smaller sketch's k-th minimum are unknown for that input;
  * estimates carry the smallest k's error, so keep k uniform in a
  * stored family). */
case class KmvUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_union"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(Int.MaxValue)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val (k, vs) = Kmv.deserialize(v.asInstanceOf[Array[Byte]])
      // min(buffer.k, k), mirroring merge(): order/partition-independent
      // (the empty buffer starts at Int.MaxValue, so the first sketch's
      // k wins there).
      val b = new KmvBuffer(math.min(buffer.k, k))
      b.addAll(buffer.toArray); b.addAll(vs)
      return b
    }
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val k = math.min(buffer.k, other.k)
    val b = new KmvBuffer(k)
    b.addAll(buffer.toArray); b.addAll(other.toArray)
    b
  }

  override def eval(buffer: KmvBuffer): Any =
    if (buffer.set.isEmpty && buffer.k == Int.MaxValue) null
    else Kmv.serialize(buffer.k, buffer.toArray)

  override def serialize(buffer: KmvBuffer): Array[Byte] =
    Kmv.serialize(buffer.k, buffer.toArray)

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val (kk, vs) = Kmv.deserialize(bytes)
    val b = new KmvBuffer(kk); b.addAll(vs); b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvUnionAgg =
    copy(child = newChildren.head)
}

/** `kmv_estimate(sketch binary) → double` — distinct-count estimate
  * (exact while the sketch holds fewer than k values). */
case class KmvEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_estimate"

  protected override def nullSafeEval(bytes: Any): Any = {
    val (k, vs) = Kmv.deserialize(bytes.asInstanceOf[Array[Byte]])
    Kmv.estimate(k, vs)
  }

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** `kmv_intersect_estimate(a binary, b binary) → double` — the theta
  * intersection estimate, the set-algebra seam HLL lacks. */
case class KmvIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_intersect_estimate"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val (ka, va) = Kmv.deserialize(a.asInstanceOf[Array[Byte]])
    val (kb, vb) = Kmv.deserialize(b.asInstanceOf[Array[Byte]])
    Kmv.intersectEstimate(ka, va, kb, vb)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersectEstimate =
    copy(left = newLeft, right = newRight)
}
