package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dual of [[graft.operators.Packing]]: documents arrive per
  * pack group (source / shard) and are assigned to fixed-budget
  * training sequences INCREMENTALLY — the keyed state is one long (the
  * group's running token offset), so a stream that has packed a billion
  * documents carries 8 bytes of state per group, and the assignment a
  * doc receives is identical to what the batch packer would emit over
  * the same arrival order.
  *
  * Within a micro-batch the group's rows are sorted by doc_id before
  * assignment (arrival order inside a batch is not deterministic);
  * across micro-batches order is arrival order, as in any streaming
  * ingest. The spec proves batch-parity: streaming the corpus in two
  * micro-batches of sorted halves yields exactly
  * `Packing.withOffsets`'s coordinates.
  */
object StreamingPacking {

  final case class Doc(group: String, doc_id: Long, n_tokens: Int)
  /** Assignment: the sequence range [first_seq, last_seq] the doc spans
    * and its starting token offset inside the group's stream.
    * Zero-token docs follow [[graft.operators.Packing.withOffsets]]'s
    * contract exactly: they span NO sequence, so the range is EMPTY —
    * `first_seq > last_seq` when the offset sits on a budget boundary,
    * an equal-seq zero-width row elsewhere. Manifest consumers drop
    * empty/zero-width rows (the batch roll-up does). */
  final case class Packed(group: String, doc_id: Long, start_tok: Long,
                          first_seq: Long, last_seq: Long)
  final case class PackState(offset: Long)

  def assign(spark: SparkSession, docs: Dataset[Doc], budget: Int): Dataset[Packed] = {
    import spark.implicits._
    require(budget > 0)
    docs.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (group: String, rows: Iterator[Doc], state: GroupState[PackState]) => {
          var off = state.getOption.map(_.offset).getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val start = off
            off += d.n_tokens
            // floorDiv, not /: truncation would mis-floor off-1 = -1
            // (a zero-token first doc), and the batch packer's floor()
            // arithmetic is the parity contract — bit-equal coordinates
            // for EVERY input, zero-token boundary docs included
            Packed(group, d.doc_id, start,
              Math.floorDiv(start, budget), Math.floorDiv(off - 1, budget))
          }
          state.update(PackState(off))
          out.iterator
        })
  }
}
