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

object expressions {
  import org.apache.spark.sql.GraftBridge

  /** Column wrapper for [[SimHash64]] (Spark 4 classic bridge). */
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  /** Column wrapper for [[MinHash64]]. */
  def minhash64(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHash64(GraftBridge.expression(shingles), k))
}
