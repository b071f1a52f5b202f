package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core._

/** Per-prefix pending-batch accumulation state.
  *
  * `processed` is the dedup ledger fragment for this prefix — the Spark
  * analogue of the reference's `LambdaRedshiftProcessedFiles` DynamoDB
  * table (`/root/reference/common.js:132-147`). Single-writer-per-key
  * state makes the reference's whole CAS/retry machinery
  * (`index.js:313-516`: conditional writes, 100-try backoff loops)
  * unnecessary: within one streaming query, each prefix's state is only
  * ever mutated by one task at a time, and checkpointing gives
  * exactly-once replay.
  *
  * Scale note: `processed` must not grow unboundedly at 100 TB — it is
  * capped at `maxLedgerEntries` (LRU by insertion order); evicted entries
  * remain queryable in the durable ledger table written downstream. The
  * reference has the same split (hot dedup check in DynamoDB, history on
  * the item).
  */
final case class BatcherState(
    currentBatch: String,
    entries: Vector[BatchEntry],
    sizeBytes: Long,
    firstWrite: Long,
    batchSeq: Long,
    processed: Map[String, Int],
    processedOrder: Vector[String])

object Batcher {

  /** Max per-prefix dedup-ledger entries held in streaming state. */
  val DefaultMaxLedgerEntries = 100000

  def initialState(prefix: String): BatcherState =
    BatcherState(batchId(prefix, 0), Vector.empty, 0L, 0L, 0L, Map.empty, Vector.empty)

  /** Deterministic batch ids (prefix-hash + rotation counter) rather than
    * the reference's uuid.v4 (`index.js:759`): replayable across
    * checkpoint recovery, unique per (prefix, rotation).
    */
  def batchId(prefix: String, seq: Long): String =
    f"b-${Integer.toHexString(prefix.hashCode)}%s-$seq%06d"

  /** The trigger predicate (`/root/reference/index.js:663-691`): flush iff
    * count ≥ batchSize ∨ bytes ≥ batchSizeBytes ∨ age > batchTimeoutSecs.
    * Age is evaluated on real processing-time timeouts rather than the
    * reference's trigger-file sweep hack (SURVEY §2.7 T2, §7.5.6 — we
    * adopt the strictly stronger semantics).
    */
  def flushReason(cfg: LoadConfig, count: Int, bytes: Long, ageMs: Long): Option[FlushReason] =
    if (count <= 0) None
    else if (count >= cfg.batchSize) Some(FlushReason.Count)
    else if (cfg.batchSizeBytes.exists(bytes >= _)) Some(FlushReason.Bytes)
    else if (cfg.batchTimeoutSecs.exists(t => ageMs > t * 1000L)) Some(FlushReason.Age)
    else None

  /** The stateful core, factored for direct unit testing with
    * `TestGroupState`. Processes this micro-batch's events for one prefix
    * and emits zero or more [[FlushCommand]]s. The load itself happens
    * downstream in `foreachBatch` — never here — so accumulation continues
    * while a flushed batch loads, matching the reference's
    * rotate-before-load (`index.js:694-806`, SURVEY §7.5.2).
    */
  def processPrefix(
      configs: Map[String, LoadConfig],
      now: () => Long)(
      prefix: String,
      events: Iterator[FileEvent],
      state: GroupState[BatcherState]): Iterator[FlushCommand] =
    Prefix.resolve(prefix, configs).map(_._2) match {
      // NB: no `return` here — an early return inside an eta-expanded
      // closure throws NonLocalReturnControl, a ControlThrowable that
      // Spark's task runner does not treat as task failure, deadlocking
      // the stream execution thread.
      case None => Iterator.empty
      case Some(cfg) => processWithConfig(cfg, now, prefix, events, state)
    }

  private def processWithConfig(
      cfg: LoadConfig,
      now: () => Long,
      prefix: String,
      events: Iterator[FileEvent],
      state: GroupState[BatcherState]): Iterator[FlushCommand] = {
    var st = state.getOption.getOrElse(initialState(prefix))
    val out = Vector.newBuilder[FlushCommand]

    def rotateAndEmit(reason: FlushReason): Unit = {
      out += FlushCommand(prefix, st.currentBatch, st.entries, st.sizeBytes, reason.name, now())
      val nextSeq = st.batchSeq + 1
      st = st.copy(
        currentBatch = batchId(prefix, nextSeq),
        entries = Vector.empty, sizeBytes = 0L, firstWrite = 0L, batchSeq = nextSeq)
    }

    if (state.hasTimedOut) {
      // age trigger (T2): fires even with no input — no dummy-file sweep
      flushReason(cfg, st.entries.size, st.sizeBytes, now() - st.firstWrite)
        .orElse(if (st.entries.nonEmpty) Some(FlushReason.Age) else None)
        .foreach(rotateAndEmit)
    }

    events.foreach { ev =>
      if (ev.unlink) {
        // control event (processedFiles --reprocess): clear the file's
        // dedup entry so its next delivery is admitted as new — the
        // Spark analogue of the reference deleting the DynamoDB
        // processed-files item (common.js:842-916). Bypasses the
        // filename filter: control targets name already-admitted files.
        val file = ev.loadFile
        st = st.copy(processed = st.processed - file,
          processedOrder = st.processedOrder.filterNot(_ == file))
      }
      // F1 admission filter, fail-open (index.js:212-238)
      else if (Prefix.filenameMatches(ev.key, cfg.filenameFilterRegex)) {
        val file = ev.loadFile
        st.processed.get(file) match {
          case Some(times) =>
            // duplicate delivery (F4/T6): count it, don't re-admit
            st = st.copy(processed = st.processed.updated(file, times + 1))
          case None =>
            // Batch age is measured from ADMISSION time, not the file's
            // modification time (reference writeDates = common.now() at
            // append, index.js:361-363): a discovery lag longer than
            // batchTimeoutSecs must not age-flush every file singly.
            val admitted = now()
            val first = if (st.entries.isEmpty) admitted else st.firstWrite
            val (pm, po) =
              if (st.processedOrder.size >= DefaultMaxLedgerEntries) {
                val evict = st.processedOrder.head
                (st.processed - evict + (file -> 1), st.processedOrder.tail :+ file)
              } else (st.processed + (file -> 1), st.processedOrder :+ file)
            st = st.copy(
              entries = st.entries :+ BatchEntry(file, ev.size, admitted),
              sizeBytes = st.sizeBytes + ev.size,
              firstWrite = first,
              processed = pm, processedOrder = po)
            flushReason(cfg, st.entries.size, st.sizeBytes, now() - st.firstWrite)
              .foreach(rotateAndEmit)
        }
      }
    }

    state.update(st)
    // arm/refresh the age timer for whatever is still pending
    cfg.batchTimeoutSecs.foreach { t =>
      if (st.entries.nonEmpty) {
        val deadline = st.firstWrite + t * 1000L - now()
        state.setTimeoutDuration(math.max(deadline, 1L))
      }
    }
    out.result().iterator
  }

  /** Wire the stateful batcher over a stream of file events. Configs are
    * resolved longest-prefix-first against the (small, broadcast-by-value)
    * config map; unresolvable events are dropped before grouping so they
    * never create state.
    */
  def run(
      spark: SparkSession,
      events: Dataset[FileEvent],
      configs: Map[String, LoadConfig],
      suppression: Prefix.Suppression = Prefix.SuppressNone,
      now: () => Long = () => System.currentTimeMillis()): Dataset[FlushCommand] = {
    import spark.implicits._
    events
      .map(e => (Prefix.resolve(Prefix.searchKey(e.bucket, e.key, suppression), configs)
                   .map(_._1).getOrElse(""), e))
      .filter(_._1.nonEmpty)
      .groupByKey(_._1)
      .mapValues(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        processPrefix(configs, now))
  }
}
