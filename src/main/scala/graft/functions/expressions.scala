package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators where composed built-ins
  * can't deliver the performance: higher-order-function lambdas are
  * interpreted per element (no whole-stage codegen inside lambda bodies),
  * which makes per-token-per-bit arithmetic ~20× slower than a tight JVM
  * loop. These expressions take the token/shingle array ONCE and do the
  * arithmetic in primitive arrays.
  *
  * Preference order per the build guidelines: composition first (done —
  * see Dedup's HOF forms), custom Expression second (this file) where the
  * composed plan is measurably inadequate (simhash: 94 s → sub-second per
  * 5k docs at sf0.1).
  */

/** 64-bit SimHash over an array of token strings: per token a 64-bit
  * hash votes ±1 on every bit; the signature's bit i is 1 iff the vote
  * sum is positive. One pass, primitive accumulators.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static so generated code can call it: a tight loop, no boxing. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        // same XXH64 core as Spark's xxhash64() builtin, seed 42
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

}

/** MinHash signature: k seeded XXH64 minima over a shingle array, one
  * pass per shingle (k updates each) in primitive arrays. The composed
  * HOF form pays interpreted-lambda overhead per (shingle × permutation);
  * this is the same arithmetic fused into one loop.
  */
case class MinHash64(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash64 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    MinHash64.compute(arr, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash64.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHash64 {
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        var i = 0
        while (i < k) {
          // seed per permutation — same family as xxhash64(col, seed)
          val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, i.toLong)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }
}

/** Word n-gram shingles in one pass: the composed HOF form
  * (transform + slice + concat_ws per position) is interpreted per
  * shingle; this builds each n-gram with a single StringBuilder sweep.
  * Matches TextFunctions.shingles semantics exactly, including the
  * shorter-than-n fallback (one shingle = all tokens joined).
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  protected override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val toks = new Array[String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    val out =
      if (len < n) Array(UTF8String.fromString(toks.mkString(" ")))
      else {
        val res = new Array[AnyRef](len - n + 1)
        var s = 0
        while (s <= len - n) {
          val sb = new java.lang.StringBuilder(32)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(s + j))
            j += 1
          }
          res(s) = UTF8String.fromString(sb.toString)
          s += 1
        }
        res.asInstanceOf[Array[AnyRef]]
      }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Rolling-hash content-defined chunk fingerprints: a Rabin-Karp style
  * polynomial rolling hash slides over the token array; positions where
  * `hash % modulus == 0` are chunk boundaries (content-defined chunking,
  * as in dedup/backup literature); each chunk's fingerprint is the XXH64
  * of its joined tokens. Output array<long> enables partial-overlap
  * detection: two documents sharing any chunk share a fingerprint —
  * catches copy-paste segments that whole-document hashing misses.
  *
  * `neutral = true` switches the per-token hash from XXH64 to the
  * first 52 bits of md5 (both engines compute md5 byte-identically)
  * and the boundary accumulator from the polynomial roll to a plain
  * window SUM — a boundary rule a SQL oracle can replay exactly
  * (`sum(hv) OVER (ROWS 7 PRECEDING) % modulus = 0`), which is what
  * lets the chunk-dedup query be hash-certified against DuckDB
  * rebuilding the chunks as STRINGS. Same CDC semantics (boundary
  * depends only on the window's content); the chunk fingerprint stays
  * the engine-side 64-bit fold, so the certification also proves the
  * hashed join path collides on nothing. Default (XXH64 roll) remains
  * the scale path — no md5 per token.
  */
case class RollingChunks(child: Expression, window: Int, modulus: Int,
                         neutral: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_chunks requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_chunks"

  protected override def nullSafeEval(input: Any): Any =
    RollingChunks.compute(input.asInstanceOf[ArrayData], window, modulus, neutral)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingChunks.compute($c, $window, $modulus, $neutral)")

  override protected def withNewChildInternal(newChild: Expression): RollingChunks =
    copy(child = newChild)
}

object RollingChunks {
  private val Base = 1099511628211L // FNV prime as polynomial base

  /** First 52 bits of md5 (13 hex chars) — the engine-neutral token
    * hash: DuckDB replays it as `('0x'||substr(md5(t),1,13))::BIGINT`.
    * 52 bits keep an 8-token window sum far inside a signed 64-bit
    * range on both engines.
    */
  private def md5Prefix52(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
    // first 7 bytes big-endian = 56 bits; drop the trailing nibble
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def compute(arr: ArrayData, window: Int, modulus: Int,
              neutral: Boolean = false): ArrayData = {
    val n = arr.numElements()
    val tokenHashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      tokenHashes(i) =
        if (arr.isNullAt(i)) 0L
        else if (neutral) md5Prefix52(arr.getUTF8String(i))
        else org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(arr.getUTF8String(i), 0L)
      i += 1
    }
    // precompute base^(window-1) for the rolling subtraction
    var basePow = 1L
    i = 1
    while (i < window) { basePow *= Base; i += 1 }

    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    var rolling = 0L
    var chunkStart = 0
    i = 0
    while (i < n) {
      // neutral mode: plain window sum (SQL-replayable, overflow-free
      // at 52-bit hashes); default: Rabin-Karp polynomial roll
      if (neutral) {
        rolling += tokenHashes(i)
        if (i >= window) rolling -= tokenHashes(i - window)
      } else {
        rolling = rolling * Base + tokenHashes(i)
        if (i >= window) rolling -= tokenHashes(i - window) * basePow * Base
      }
      // boundary depends ONLY on the window content (never on chunkStart):
      // a min-chunk-length gate would make boundaries position-dependent
      // and desynchronize chunking between documents sharing a segment.
      val boundary = i >= window - 1 &&
        java.lang.Long.remainderUnsigned(rolling, modulus.toLong) == 0L
      if (boundary || i == n - 1) {
        // fingerprint = order-sensitive fold of the chunk's token hashes
        var fp = 0xcbf29ce484222325L
        var j = chunkStart
        while (j <= i) { fp = (fp ^ tokenHashes(j)) * Base; j += 1 }
        out += fp
        chunkStart = i + 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
}

/** Top-`take` nearest IVF cells for a vector: ranks cells by dot product
  * with unit-normalized centroids (== cosine ranking, since the vector's
  * own norm is constant per row). The centroid matrix rides along as ONE
  * plan reference object — NOT nlist generated literal columns, which
  * blows up codegen at nlist=4096. One tight primitive loop per row:
  * O(nlist × dim) multiply-adds + O(nlist × take) selection.
  *
  * Serves both IVF roles: corpus multi-assignment (take = nassign) and
  * query routing (take = nprobe).
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], take: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires array<float> or array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Unit-normalized centroids — dot against these ranks identically to
    * cosine. Computed once per expression instance, shared by eval and
    * the generated code (as a reference object).
    */
  @transient private lazy val normed: Array[Array[Double]] =
    NearestCells.normalize(centroids)

  protected override def nullSafeEval(input: Any): Any =
    NearestCells.compute(input.asInstanceOf[ArrayData], normed, take, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCentroids", normed, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCells.compute($c, $cRef, $take, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def normalize(cents: Array[Array[Double]]): Array[Array[Double]] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) c else c.map(_ / n)
    }

  def compute(vec: ArrayData, cents: Array[Array[Double]], take: Int,
              isFloat: Boolean): ArrayData = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val nlist = cents.length
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val cent = cents(c)
      val d = math.min(dim, cent.length)
      var s = 0.0; var j = 0
      while (j < d) { s += v(j) * cent(j); j += 1 }
      sims(c) = s
      c += 1
    }
    val k = math.min(take, nlist)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < k) {
      var best = -1; var bestSim = Double.NegativeInfinity
      var c2 = 0
      while (c2 < nlist) {
        if (!taken(c2) && sims(c2) > bestSim) { best = c2; bestSim = sims(c2) }
        c2 += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Random-hyperplane LSH signature: bit i = sign(dot(vec, plane_i)).
  * The plane matrix rides as ONE codegen reference object — the same
  * shape that fixed IVF's nlist=4096 cliff — so `bits` can grow to 64
  * without emitting a literal array column per plane (the composed
  * Column form at bits=b generates b array literals and b aggregate
  * loops; this is one fused loop).
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 64,
    "hyperplane signature packs into one long: 1..64 planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float> or array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSig.compute($c, $pRef, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  def compute(vec: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): Long = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val d = math.min(dim, p.length)
      var s = 0.0; var j = 0
      while (j < d) { s += v(j) * p(j); j += 1 }
      if (s > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** array<string> → SORTED array<long> of per-element XXH64 hashes: the
  * compact set representation the exact-Jaccard verification joins carry
  * instead of the string arrays themselves (8 bytes/element, and sorted
  * so intersection is a linear merge). Hash collisions would perturb the
  * count at ~|set|²/2⁶⁴ probability — negligible and deterministic.
  */
case class HashedSet(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_set requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_set"

  protected override def nullSafeEval(input: Any): Any =
    HashedSet.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedSet.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HashedSet =
    copy(child = newChild)
}

object HashedSet {
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) 0L
        else org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(arr.getUTF8String(i), 0L)
      i += 1
    }
    java.util.Arrays.sort(out)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Per-document n-gram repetition statistics — the raw counts behind
  * Gopher/MassiveText-style repetition quality filters (duplicate-
  * n-gram fraction, top-n-gram fraction): struct(total_ngrams,
  * distinct_ngrams, top_count) over the token array's n-grams, with
  * [[Shingles]]' short-input fallback (fewer than n tokens → one
  * whole-text gram). One codegen'd pass per row — hash the windows,
  * sort, run-scan — so the metric is computed at the scan with NO
  * shuffle; the explode + groupBy(doc, gram) formulation shuffles every
  * gram occurrence of the corpus.
  */
case class GramStats(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_stats requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("total_ngrams", IntegerType, nullable = false),
    StructField("distinct_ngrams", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false)))
  override def prettyName: String = "gram_stats"

  protected override def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {
  def compute(arr: ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val len = arr.numElements()
    val toks = new Array[String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    val hashes: Array[Long] =
      if (len < n)
        Array(org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
          UTF8String.fromString(toks.mkString(" ")), 0L))
      else {
        val out = new Array[Long](len - n + 1)
        var s = 0
        while (s <= len - n) {
          val sb = new java.lang.StringBuilder(32)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(s + j))
            j += 1
          }
          out(s) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
            UTF8String.fromString(sb.toString), 0L)
          s += 1
        }
        out
      }
    java.util.Arrays.sort(hashes)
    var distinct = 0
    var top = 0
    var run = 0
    i = 0
    while (i < hashes.length) {
      if (i == 0 || hashes(i) != hashes(i - 1)) { distinct += 1; run = 1 }
      else run += 1
      if (run > top) top = run
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hashes.length, distinct, top))
  }
}

/** Exact Jaccard of two SORTED long arrays (from [[HashedSet]]) by
  * linear merge — O(|a|+|b|), no per-row hash-set allocation. The
  * composed form (array_intersect over string arrays) builds and probes
  * a hash set of UTF8Strings per candidate pair; at millions of
  * candidate pairs that dominates the verification join.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard requires two array<long>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** Cosine similarity of two numeric arrays in one primitive loop — the
  * hot inner kernel of every embedding operator (brute-force top-k, LSH
  * re-rank, IVF re-rank, semantic dedup). The composed zip_with +
  * aggregate form allocates an intermediate array per row and walks it
  * through interpreted lambdas; at millions of candidate pairs that
  * dominates the stage. Accumulates dot and both norms in double in a
  * single fused pass, no allocation.
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double>, got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim.compute($a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)})")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

/** Product-quantization encode: split the (optionally unit-normalized)
  * vector into `m` subvectors and emit, per subspace, the index of the
  * L2-nearest codebook centroid — one byte each, so a d-dim float
  * vector compresses to m bytes (d=64 floats = 256 B → 8 B at m=8:
  * 32×). The codebook tensor (m × ksub × d/m) rides as ONE reference
  * object, same as [[NearestCells]]' centroid matrix — codegen-safe at
  * any ksub.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]],
                    normalize: Boolean)
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks(0).length <= 256,
    "pq_encode needs 1..256 centroids per subspace (one byte per code)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float> or array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebooks, isFloat, normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqEncode.compute($c, $ref, $isFloat, $normalize)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def unitize(vec: ArrayData, isFloat: Boolean): Array[Double] = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var s = 0.0
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      s += v(i) * v(i)
      i += 1
    }
    if (s > 0.0) {
      val n = math.sqrt(s)
      i = 0
      while (i < dim) { v(i) /= n; i += 1 }
    }
    v
  }

  def compute(vec: ArrayData, books: Array[Array[Array[Double]]],
              isFloat: Boolean, normalize: Boolean): Array[Byte] = {
    val v =
      if (normalize) unitize(vec, isFloat)
      else {
        val dim = vec.numElements()
        val a = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          a(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          i += 1
        }
        a
      }
    val m = books.length
    val out = new Array[Byte](m)
    var sub = 0
    var off = 0
    while (sub < m) {
      val cents = books(sub)
      val dsub = cents(0).length
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val ce = cents(c)
        var d2 = 0.0; var j = 0
        while (j < dsub && off + j < v.length) {
          val diff = v(off + j) - ce(j)
          d2 += diff * diff
          j += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(sub) = (best & 0xFF).toByte
      off += dsub
      sub += 1
    }
    out
  }
}

/** PQ asymmetric-distance computation: approximate dot(query, corpus
  * vector) from the corpus vector's m-byte code alone — Σ over
  * subspaces of dot(querySub, codebook[sub][code]). The scan reads
  * 8-byte codes instead of 256-byte vectors (the 100 TB win: the ANN
  * scan is IO-bound); compute per pair is the same O(d) as an exact
  * dot, on reconstructed centroids. Query-side normalization folds the
  * cosine denominator into the ADC score (corpus side was normalized
  * before encoding).
  */
case class PqAdc(left: Expression, right: Expression,
                 codebooks: Array[Array[Array[Double]]], normalize: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType, _) | ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (binary codes, array<float|double> query), got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  private def qIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(codes: Any, qvec: Any): Any =
    PqAdc.compute(codes.asInstanceOf[Array[Byte]], qvec.asInstanceOf[ArrayData],
      codebooks, qIsFloat, normalize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.functions.PqAdc.compute($c, $q, $ref, $qIsFloat, $normalize)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def compute(codes: Array[Byte], qvec: ArrayData,
              books: Array[Array[Array[Double]]], qIsFloat: Boolean,
              normalize: Boolean): Double = {
    val q =
      if (normalize) PqEncode.unitize(qvec, qIsFloat)
      else {
        val dim = qvec.numElements()
        val a = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          a(i) = if (qIsFloat) qvec.getFloat(i).toDouble else qvec.getDouble(i)
          i += 1
        }
        a
      }
    val m = math.min(codes.length, books.length)
    var s = 0.0
    var sub = 0
    var off = 0
    while (sub < m) {
      val ce = books(sub)(codes(sub) & 0xFF)
      var j = 0
      while (j < ce.length && off + j < q.length) {
        s += q(off + j) * ce(j)
        j += 1
      }
      off += ce.length
      sub += 1
    }
    s
  }
}

/** Serializable carrier for a Spark sketch BloomFilter: holds the
  * serialized bytes (what actually ships with the plan / task closure)
  * and lazily inflates the filter once per executor.
  */
final class BloomRef(val bytes: Array[Byte]) extends Serializable {
  @transient lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
}

/** Bloom-filter membership test for a long key, with the filter as a
  * plan reference object ([[NearestCells]]' pattern — never N literal
  * columns, never a UDF). Used to prune an incoming batch's LSH
  * buckets against a stored corpus's bucket-hash Bloom before any join
  * touches the stored table: a definite miss (the common case for a
  * clean batch) drops the row in the scan, and an all-miss batch lets
  * AQE's empty-relation propagation skip the stored scan entirely.
  */
case class BloomContainsLong(child: Expression, bloom: BloomRef)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_long requires bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_long"

  protected override def nullSafeEval(input: Any): Any =
    bloom.filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomRef", bloom, "graft.functions.BloomRef")
    defineCodeGen(ctx, ev, c => s"$ref.filter().mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)
}

/** Single-pass row-local form of [[graft.operators.Repetition]]'s
  * per-document signals: top-`topN`-gram leader (count desc, gram asc)
  * and character coverage of duplicated `dupN`-grams, off one token
  * array — no explode, no shuffle, no window. Row-locality makes it
  * streaming-safe where the relational form's windows are not; a
  * parity spec pins it row-identical to the oracle-certified
  * relational signals. Gram semantics match [[Shingles]] exactly
  * (shorter-than-n fallback included); character counts are codepoint
  * counts (Spark `length` semantics).
  */
case class RepetitionSignals(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_signals requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("word_chars", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = false),
    StructField("top_gram_count", LongType, nullable = false),
    StructField("top_gram_chars", LongType, nullable = false),
    StructField("dup_covered_chars", LongType, nullable = false)))
  override def prettyName: String = "repetition_signals"

  protected override def nullSafeEval(input: Any): Any =
    RepetitionSignals.compute(input.asInstanceOf[ArrayData], topN, dupN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionSignals.compute($c, $topN, $dupN)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionSignals =
    copy(child = newChild)
}

object RepetitionSignals {

  private def grams(toks: Array[String], n: Int): Array[String] =
    if (toks.length < n) Array(toks.mkString(" "))
    else {
      val out = new Array[String](toks.length - n + 1)
      var s = 0
      while (s <= toks.length - n) {
        val sb = new java.lang.StringBuilder(32)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(s + j))
          j += 1
        }
        out(s) = sb.toString
        s += 1
      }
      out
    }

  private def numChars(s: String): Int = s.codePointCount(0, s.length)

  def compute(arr: ArrayData, topN: Int, dupN: Int): InternalRow = {
    val len = arr.numElements()
    val toks = new Array[String](len)
    var wordChars = 0L
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      wordChars += numChars(toks(i))
      i += 1
    }

    // top-topN-gram under (count desc, gram asc)
    val topGrams = grams(toks, topN)
    val cnt = new java.util.HashMap[String, Int](topGrams.length * 2)
    i = 0
    while (i < topGrams.length) {
      cnt.merge(topGrams(i), 1, (a, b) => a + b); i += 1
    }
    var bestGram: String = null
    var bestCnt = 0
    val it = cnt.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > bestCnt ||
          (e.getValue == bestCnt && (bestGram == null || e.getKey.compareTo(bestGram) < 0))) {
        bestGram = e.getKey; bestCnt = e.getValue
      }
    }
    if (bestGram == null) bestGram = ""
    var bestSpaces = 0
    i = 0
    while (i < bestGram.length) { if (bestGram.charAt(i) == ' ') bestSpaces += 1; i += 1 }
    val topChars = bestCnt.toLong * (numChars(bestGram) - bestSpaces)

    // duplicated-dupN-gram position coverage (full windows only — the
    // shorter-than-n fallback gram occurs once and can never be dup)
    var covChars = 0L
    if (len >= dupN) {
      val dupGrams = grams(toks, dupN)
      val cnt2 = new java.util.HashMap[String, Int](dupGrams.length * 2)
      i = 0
      while (i < dupGrams.length) { cnt2.merge(dupGrams(i), 1, (a, b) => a + b); i += 1 }
      val covered = new Array[Boolean](len)
      i = 0
      while (i < dupGrams.length) {
        if (cnt2.get(dupGrams(i)) >= 2) {
          var p = i
          while (p < i + dupN) { covered(p) = true; p += 1 }
        }
        i += 1
      }
      i = 0
      while (i < len) {
        if (covered(i)) covChars += numChars(toks(i))
        i += 1
      }
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](len, wordChars, UTF8String.fromString(bestGram),
        bestCnt.toLong, topChars, covChars))
  }
}

object expressions {
  import org.apache.spark.sql.GraftBridge

  /** Column wrapper for [[SimHash64]] (Spark 4 classic bridge). */
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  /** Column wrapper for [[MinHash64]]. */
  def minhash64(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHash64(GraftBridge.expression(shingles), k))

  /** Column wrapper for [[RollingChunks]]. `neutral = true` selects
    * the md5-prefix boundary rule a SQL oracle can replay (see the
    * expression's scaladoc); default is the XXH64 scale path. */
  def rolling_chunks(tokens: Column, window: Int = 8, modulus: Int = 16,
                     neutral: Boolean = false): Column =
    GraftBridge.column(RollingChunks(GraftBridge.expression(tokens), window, modulus, neutral))

  /** Column wrapper for [[Shingles]]. */
  def shingles_fast(tokens: Column, n: Int): Column =
    GraftBridge.column(Shingles(GraftBridge.expression(tokens), n))

  /** Column wrapper for [[NearestCells]]. */
  def nearest_cells(vec: Column, centroids: Array[Array[Double]], take: Int): Column =
    GraftBridge.column(NearestCells(GraftBridge.expression(vec), centroids, take))

  /** Column wrapper for [[graft.functions.SpaceSavingTopK]] (an
    * aggregate — use inside `agg(...)`). */
  def space_saving_top_k(item: Column, k: Int, capacity: Int = 0): Column = {
    val cap = if (capacity > 0) capacity else math.max(8 * k, 64)
    GraftBridge.column(
      SpaceSavingTopK(GraftBridge.expression(item), k, cap).toAggregateExpression())
  }

  /** Column wrapper for [[graft.functions.GroupTopK]] (an aggregate —
    * use inside `agg(...)`): exact per-group top-k under (key desc,
    * id asc) with bounded mergeable state. */
  def group_top_k(key: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      GroupTopK(GraftBridge.expression(key), GraftBridge.expression(id), k)
        .toAggregateExpression())

  /** Column wrapper for [[HyperplaneSig]]. */
  def hyperplane_sig(vec: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(HyperplaneSig(GraftBridge.expression(vec), planes))

  /** Column wrapper for [[HashedSet]]. */
  def hashed_set(strings: Column): Column =
    GraftBridge.column(HashedSet(GraftBridge.expression(strings)))

  /** Column wrapper for [[SortedJaccard]]. */
  def sorted_jaccard(a: Column, b: Column): Column =
    GraftBridge.column(SortedJaccard(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column wrapper for [[GramStats]]. */
  def gram_stats(tokens: Column, n: Int): Column =
    GraftBridge.column(GramStats(GraftBridge.expression(tokens), n))

  /** Column wrapper for [[RepetitionSignals]]. */
  def repetition_signals(tokens: Column, topN: Int, dupN: Int): Column =
    GraftBridge.column(RepetitionSignals(GraftBridge.expression(tokens), topN, dupN))

  /** Column wrapper for [[KmvAgg]] (an aggregate — use inside `agg`). */
  def kmv_sketch(item: Column, k: Int): Column =
    GraftBridge.column(KmvAgg(GraftBridge.expression(item), k).toAggregateExpression())

  /** Column wrapper for [[KmvUnionAgg]] (an aggregate). */
  def kmv_union(sketch: Column): Column =
    GraftBridge.column(KmvUnionAgg(GraftBridge.expression(sketch)).toAggregateExpression())

  /** Column wrapper for [[KmvEstimate]]. */
  def kmv_estimate(sketch: Column): Column =
    GraftBridge.column(KmvEstimate(GraftBridge.expression(sketch)))

  /** Column wrapper for [[KmvIntersectEstimate]]. */
  def kmv_intersect_estimate(a: Column, b: Column): Column =
    GraftBridge.column(KmvIntersectEstimate(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column wrapper for [[CosineSim]]. */
  /** Column wrapper for [[BloomContainsLong]]. */
  def bloom_contains_long(key: Column, bloom: BloomRef): Column =
    GraftBridge.column(BloomContainsLong(GraftBridge.expression(key), bloom))

  /** Column wrapper for [[PqEncode]]. */
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]],
                normalize: Boolean = true): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebooks, normalize))

  /** Column wrapper for [[PqAdc]]. */
  def pq_adc(codes: Column, qvec: Column, codebooks: Array[Array[Array[Double]]],
             normalize: Boolean = true): Column =
    GraftBridge.column(PqAdc(GraftBridge.expression(codes), GraftBridge.expression(qvec),
      codebooks, normalize))

  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
}
