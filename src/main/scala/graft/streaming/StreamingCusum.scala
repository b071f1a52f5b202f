package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM — the stateful dual of
  * [[graft.operators.TimeSeries.cusum]] for continuously-arriving
  * per-key series (daily rollups, rate meters): each key carries the
  * textbook recursion's two longs `(S, lastOrder)` in keyed state, so
  * arrival N costs O(1) and the alarm fires in the micro-batch where
  * the threshold is crossed, not at the next batch recompute.
  *
  * Emits exactly the batch operator's `(key, order, cusum, alarm)`
  * rows (parity spec) when points arrive in order. Out-of-order
  * points within a key are DROPPED and surfaced with `accepted =
  * false` — CUSUM's recursion is order-defined, so silently folding a
  * late point in would corrupt every subsequent value; upstream
  * should deliver per-key ordered rollups (the contraction is small).
  * Within one micro-batch, points sort by `order` before folding.
  */
object StreamingCusum {

  final case class Point(key: String, order: Long, value: Long, target: Long)
  final case class CusumOut(key: String, order: Long, cusum: Long,
                            alarm: Boolean, accepted: Boolean)
  /** Keyed state (public for the state encoder's generated code). */
  final case class CusumState(s: Long, lastOrder: Long)

  def detect(spark: SparkSession, points: Dataset[Point],
             slack: Long, threshold: Long): Dataset[CusumOut] = {
    import spark.implicits._
    points
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Point], state: GroupState[CusumState]) => {
          var st = state.getOption.getOrElse(CusumState(0L, Long.MinValue))
          val out = rows.toSeq.sortBy(_.order).map { p =>
            if (p.order <= st.lastOrder)
              CusumOut(key, p.order, -1L, alarm = false, accepted = false)
            else {
              val s = math.max(0L, st.s + (p.value - p.target - slack))
              st = CusumState(s, p.order)
              CusumOut(key, p.order, s, alarm = s > threshold, accepted = true)
            }
          }
          state.update(st)
          out.iterator
        })
  }
}
