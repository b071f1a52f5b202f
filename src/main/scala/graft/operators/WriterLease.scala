package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Single-writer LEASE on a stored-state path — the loud enforcement of
  * the contract [[StoredMerge]] and [[graft.streaming.CurationIngest]]
  * previously only documented: two jobs pointed at the same offsets
  * path or dedup table would silently interleave commits (and one's
  * entry recovery could roll back the other's in-flight bucket swap).
  * This is the engine analogue of the reference's per-prefix
  * conditional-write flush lock (`index.js:724–731` — the CAS on
  * `currentBatch` that makes exactly one flusher win); files here stand
  * in for DynamoDB conditional puts.
  *
  * Mechanics: a `<path>.writer_lock` marker holding `owner\nexpiry`.
  * Acquisition creates it EXCLUSIVELY (`FileSystem.create(overwrite =
  * false)` — atomic on HDFS and local; object stores need their
  * conditional-put equivalent); a live lock held by another owner
  * fails LOUDLY — the second writer must not touch the state. Expiry
  * is the crash escape: a holder that died without releasing blocks
  * writers only until `ttlMs` passes, then the next acquire breaks the
  * stale lock and proceeds (the stored-state crash disciplines make
  * that safe: every commit path is replay-convergent). Re-acquisition
  * by the SAME owner refreshes the expiry and is re-entrant — a job's
  * nested commits (e.g. [[graft.streaming.CurationIngest.commitBatch]]
  * wrapping [[StoredMerge.upsertBuckets]]) share one lease.
  *
  * Owner identity: default is one id per JVM ([[jvmOwner]]) — distinct
  * JOBS (separate JVMs) conflict, a job's own nested writes don't.
  * Jobs sharing a JVM that must conflict (two streaming queries on one
  * SparkSession) pass distinct owners explicitly
  * ([[graft.streaming.CurationIngest.Config.writerId]] mints one per
  * config).
  */
object WriterLease {

  /** One writer identity per JVM — nested writes by the same process
    * re-enter their own lease instead of deadlocking. */
  val jvmOwner: String = java.util.UUID.randomUUID().toString

  /** Default lease lifetime. Generous on purpose: a healthy commit
    * re-acquires (refreshing expiry) every batch, so the TTL only
    * bounds how long a CRASHED writer's lock blocks a successor —
    * and breaking a lock whose holder still lives would let two
    * writers interleave, the exact corruption the lease exists to
    * prevent. */
  val DefaultTtlMs: Long = 30L * 60L * 1000L

  final case class Holder(owner: String, expiresAtMs: Long)

  private def lockPath(path: String): Path =
    new Path(path.stripSuffix("/") + ".writer_lock")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The current lock's (owner, expiry), if any — the status readout. */
  def holder(spark: SparkSession, path: String): Option[Holder] = {
    val lp = lockPath(path)
    val fs = fsOf(spark, lp)
    if (!fs.exists(lp)) None
    else {
      val in = fs.open(lp)
      val content =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      content.split("\n", 2) match {
        case Array(o, e) if e.trim.nonEmpty && e.trim.forall(_.isDigit) =>
          Some(Holder(o, e.trim.toLong))
        // a torn/garbled lock file (crash mid-create) reads as an
        // already-expired lease: the next acquire breaks it
        case _ => Some(Holder("<corrupt>", 0L))
      }
    }
  }

  /** Same-JVM hold depth per (lock, owner): n acquires need n releases
    * before the lock file is deleted, so a job-lifetime hold (the
    * streaming query) and its nested per-commit re-entries — or a
    * restarting query overlapping its predecessor's async release —
    * can never drop each other's lease. Cross-JVM there is no depth:
    * a dead JVM's hold is exactly what the TTL expiry breaks.
    */
  private val holdDepth =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Integer]()

  /** Acquire (or re-enter) the lease. Returns true if FRESHLY acquired
    * (hold depth 0 → 1); false if re-entered by the same owner (depth
    * incremented, expiry refreshed). Every acquire must be balanced by
    * one [[release]]. Throws
    * [[java.util.ConcurrentModificationException]] if another owner
    * holds a live lease.
    */
  def acquire(spark: SparkSession, path: String,
              owner: String = jvmOwner,
              ttlMs: Long = DefaultTtlMs): Boolean = {
    val lp = lockPath(path)
    val fs = fsOf(spark, lp)
    val now = System.currentTimeMillis()
    holder(spark, path) match {
      case Some(h) if h.owner == owner =>
        write(fs, lp, owner, now + ttlMs, overwrite = true) // refresh
        holdDepth.merge((lp.toString, owner), 1, _ + _)
        false
      case Some(h) if now < h.expiresAtMs =>
        throw new java.util.ConcurrentModificationException(
          s"stored state at $path is lease-held by writer ${h.owner} " +
            s"until ${h.expiresAtMs} (now $now): a second concurrent " +
            "writer would silently interleave commits — stop the other " +
            "job, or wait for its lease to expire if it crashed")
      case held => // absent, expired, or corrupt: break and take it.
        // BREAK RACE NARROWING: the break is delete-then-create — two
        // writers racing to break the SAME expired lock could
        // interleave (B's delete landing on A's fresh lock). Narrow
        // it: (a) re-verify the lock is STILL the expired one read
        // above immediately before deleting (never delete a live
        // successor's lock), (b) exclusive create (the loser of a
        // create race fails loudly), (c) verify ownership after
        // create. Absent a filesystem conditional-put this cannot be
        // airtight — an object-store deployment should back the lock
        // with its conditional-write primitive (the reference's
        // DynamoDB CAS, `index.js:724-731`); the LIVE-lock path (the
        // normal case) is exact either way, and expiry-breaking only
        // races writers contending for an already-crashed holder's
        // lock in the same instant.
        if (holder(spark, path).map(h => (h.owner, h.expiresAtMs)) ==
            held.map(h => (h.owner, h.expiresAtMs)))
          fs.delete(lp, false)
        held.foreach(h => holdDepth.remove((lp.toString, h.owner)))
        try write(fs, lp, owner, now + ttlMs, overwrite = false)
        catch {
          // lost the break-and-take race to another writer: held
          case _: java.io.IOException =>
            throw new java.util.ConcurrentModificationException(
              s"stored state at $path was lease-acquired by a concurrent " +
                "writer during acquisition — exactly one writer may hold it")
        }
        if (!holder(spark, path).exists(_.owner == owner))
          throw new java.util.ConcurrentModificationException(
            s"stored state at $path was lease-acquired by a concurrent " +
              "writer during acquisition — exactly one writer may hold it")
        holdDepth.put((lp.toString, owner), 1)
        true
    }
  }

  private def write(fs: FileSystem, lp: Path, owner: String,
                    expiresAtMs: Long, overwrite: Boolean): Unit = {
    val out = fs.create(lp, overwrite)
    try out.write(s"$owner\n$expiresAtMs".getBytes("UTF-8"))
    finally out.close()
  }

  /** Refresh an owned lease's expiry WITHOUT taking a hold — the
    * heartbeat for long-lived holders whose work is event-driven (an
    * idle stream gets no commits, so nothing else would re-extend the
    * lease and a healthy job's lock would expire out from under it).
    * No-op if the lease is not currently this owner's (expired and
    * broken, or never held) — the holder finds out at its next real
    * acquire, loudly.
    */
  def refresh(spark: SparkSession, path: String,
              owner: String = jvmOwner,
              ttlMs: Long = DefaultTtlMs): Unit = {
    val lp = lockPath(path)
    val fs = fsOf(spark, lp)
    holder(spark, path) match {
      case Some(h) if h.owner == owner =>
        write(fs, lp, owner, System.currentTimeMillis() + ttlMs, overwrite = true)
      case _ => ()
    }
  }

  /** The canonical lock location for a MANAGED table's stored state —
    * its warehouse path. Every library mutator (corpus appends, LM
    * accretion, managed-table merges) and every CLI repair must derive
    * the lock from THIS helper: the lease contract is only as strong
    * as all writers agreeing on the lock location.
    */
  def tableStatePath(spark: SparkSession, table: String): String =
    new Path(spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table))).toString

  /** Release one hold of an owned lease; the lock file is deleted only
    * when the LAST same-JVM hold releases (depth-balanced with
    * [[acquire]]). Idempotent on an absent lock. Releasing ANOTHER
    * owner's lease throws — that is always a caller bug. */
  def release(spark: SparkSession, path: String,
              owner: String = jvmOwner): Unit = {
    val lp = lockPath(path)
    val fs = fsOf(spark, lp)
    holder(spark, path) match {
      case Some(h) if h.owner == owner =>
        val depth = holdDepth.merge((lp.toString, owner), -1, _ + _)
        if (depth == null || depth <= 0) {
          holdDepth.remove((lp.toString, owner))
          fs.delete(lp, false)
        }
      case Some(h) =>
        throw new IllegalStateException(
          s"refusing to release $path's lease: held by ${h.owner}, not $owner")
      case None => holdDepth.remove((lp.toString, owner)); ()
    }
  }

  /** Run `body` under the lease: acquire (loud failure if another
    * writer holds it), execute, release the hold — a nested same-owner
    * body decrements only its own depth, so an outer job-lifetime hold
    * keeps the lock. The release runs on exceptions too (a FAILED
    * commit frees the path for an immediate retry — replay convergence
    * makes the retry correct); a hard JVM death skips it, which is
    * what the TTL expiry is for. A release finding the lease taken
    * over (our hold expired mid-body and a successor broke it) is
    * swallowed here — the body's own result must win; direct
    * [[release]] callers still get the loud error.
    */
  def withLease[T](spark: SparkSession, path: String,
                   owner: String = jvmOwner,
                   ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    acquire(spark, path, owner, ttlMs)
    try body
    finally {
      try release(spark, path, owner)
      catch { case _: IllegalStateException => () }
    }
  }
}
