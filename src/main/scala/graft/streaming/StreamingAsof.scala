package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming as-of enrichment — the stream-static dual of
  * [[graft.operators.AsofJoin]]: every micro-batch of events picks the
  * latest reference-table row at-or-before its timestamp, per key
  * (price snapshots, config versions, model revisions).
  *
  * Shape: the batch operator runs inside `foreachBatch`, so semantics
  * are EXACTLY the oracle-checked q60 operator's — no re-implementation
  * to drift. The static side re-resolves per micro-batch (Spark
  * re-plans stream-static joins every batch), which is what makes a
  * slowly-growing reference table (appended snapshots) visible to the
  * stream without restarts. The per-batch cost is the batch operator's:
  * one keyed shuffle of batch + reference; for a large reference,
  * store it bucketed by key so only the (small) batch side exchanges.
  */
object StreamingAsof {

  /** Wire a streaming frame through the batch as-of into `sink`.
    * `reference` is resolved lazily per micro-batch via the thunk.
    */
  def enriched(stream: DataFrame, reference: () => DataFrame,
               keys: Seq[String], tsCol: String, payload: Seq[String],
               tieCol: String)(sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(graft.operators.AsofJoin.backward(
          batch, reference(), keys, tsCol, payload, tieCol), id)
      }

  /** Convenience runner used by the specs: start, feed via `act`,
    * stop — results accumulate through `sink`.
    */
  def run(spark: SparkSession, stream: DataFrame, reference: () => DataFrame,
          keys: Seq[String], tsCol: String, payload: Seq[String], tieCol: String)
         (collect: DataFrame => Unit): StreamingQuery =
    enriched(stream, reference, keys, tsCol, payload, tieCol)(
      (df, _) => collect(df)).start()
}
