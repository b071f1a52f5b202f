package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA — the stateful dual of
  * [[graft.operators.TimeSeries.ewma]] for continuously-arriving
  * per-key series: each key keeps its `span` most recent values
  * (newest first) in keyed state, so arrival N costs O(span) and the
  * smoothed level updates in the micro-batch the point lands in.
  *
  * Emits the batch operator's exact cleared rationals — `ewma_num`,
  * `ewma_den` with the dyadic weights `(2^a−1)^i · 2^(a(span−1−i))`,
  * and the truncating quotient (JVM `/` on longs truncates toward
  * zero exactly like Spark `div` / DuckDB `//`) — so the parity spec
  * can assert byte-equality against [[graft.operators.TimeSeries
  * .ewma]] per (key, order). Early arrivals renormalize over the
  * values present, matching the batch adjust=True convention.
  *
  * Ordering contract (the [[StreamingCusum]] rule): the recursion is
  * order-defined, so an out-of-order point is DROPPED and surfaced
  * with `accepted = false` rather than silently corrupting every
  * subsequent window; within one micro-batch, points sort by `order`
  * before folding.
  */
object StreamingSmoothing {

  final case class Point(key: String, order: Long, value: Long)
  final case class EwmaOut(key: String, order: Long, ewmaNum: Long,
                           ewmaDen: Long, ewmaC: Long, accepted: Boolean)
  /** Keyed state (public for the state encoder's generated code):
    * the last ≤span values newest-first, plus the order high-water.
    */
  final case class EwmaState(recent: Seq[Long], lastOrder: Long)

  def smooth(spark: SparkSession, points: Dataset[Point],
             alphaExp: Int, span: Int): Dataset[EwmaOut] = {
    require(alphaExp >= 1, "alphaExp must be >= 1 (alpha = 2^-alphaExp)")
    require(span >= 1, "span must be >= 1")
    require(alphaExp.toLong * span <= 62,
      "alphaExp*span must be <= 62 to keep integer weights in a long")
    import spark.implicits._
    val odd = (1L << alphaExp) - 1
    val wt: Array[Long] = Array.tabulate(span) { i =>
      var p = 1L; var j = 0
      while (j < i) { p *= odd; j += 1 }
      p << (alphaExp * (span - 1 - i))
    }
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Point], state: GroupState[EwmaState]) => {
          var st = state.getOption.getOrElse(EwmaState(Nil, Long.MinValue))
          val out = rows.toSeq.sortBy(_.order).map { p =>
            if (p.order <= st.lastOrder)
              EwmaOut(key, p.order, -1L, -1L, -1L, accepted = false)
            else {
              val recent = (p.value +: st.recent).take(span)
              var num = 0L; var den = 0L; var i = 0
              while (i < recent.length) {
                num += recent(i) * wt(i); den += wt(i); i += 1
              }
              st = EwmaState(recent, p.order)
              EwmaOut(key, p.order, num, den, num / den, accepted = true)
            }
          }
          state.update(st)
          out.iterator
        })
  }

  final case class HoltOut(key: String, order: Long, x: Long, lvl: Long,
                           tr: Long, err: Long, accepted: Boolean)
  /** Keyed Holt state: current level/trend, whether the seed row has
    * been consumed, and the order high-water. O(1) per key — unlike
    * [[EwmaState]] there is no window to keep; the recurrence IS the
    * state.
    */
  final case class HoltState(lvl: Long, tr: Long, started: Boolean,
                             lastOrder: Long)

  /** Streaming Holt linear smoothing — the stateful dual of
    * [[graft.operators.TimeSeries.holtSmooth]]: identical integer
    * fixed-point recurrence (dyadic α = 2^−a, β = 2^−b, truncating JVM
    * `/` ≡ Spark `div`), so the parity spec asserts byte-equality per
    * (key, order) against the batch fold. Seed row: lvl = x, tr = 0,
    * err = 0. Same ordering contract as [[smooth]]: out-of-order
    * points are dropped loudly (`accepted = false`), in-batch points
    * sort by order first.
    */
  def holt(spark: SparkSession, points: Dataset[Point],
           alphaExp: Int, betaExp: Int): Dataset[HoltOut] = {
    require(alphaExp >= 1 && alphaExp <= 30, "alphaExp in 1..30")
    require(betaExp >= 1 && betaExp <= 30, "betaExp in 1..30")
    import spark.implicits._
    val a = 1L << alphaExp
    val b = 1L << betaExp
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Point], state: GroupState[HoltState]) => {
          var st = state.getOption.getOrElse(
            HoltState(0L, 0L, started = false, Long.MinValue))
          val out = rows.toSeq.sortBy(_.order).map { p =>
            if (st.started && p.order <= st.lastOrder)
              HoltOut(key, p.order, p.value, -1L, -1L, -1L, accepted = false)
            else if (!st.started) {
              st = HoltState(p.value, 0L, started = true, p.order)
              HoltOut(key, p.order, p.value, p.value, 0L, 0L, accepted = true)
            } else {
              val err = p.value - (st.lvl + st.tr)
              val nl = (p.value + (a - 1) * (st.lvl + st.tr)) / a
              val nt = ((nl - st.lvl) + (b - 1) * st.tr) / b
              st = HoltState(nl, nt, started = true, p.order)
              HoltOut(key, p.order, p.value, nl, nt, err, accepted = true)
            }
          }
          state.update(st)
          out.iterator
        })
  }
}
