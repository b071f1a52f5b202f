package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The single-writer lease on stored-state paths: loud second-writer
  * refusal, same-owner re-entrancy, crashed-holder expiry, and the
  * [[StoredMerge.upsertBuckets]] enforcement (state untouched when the
  * lease is held elsewhere).
  */
class WriterLeaseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"lease_$tag").toString + "/t"

  test("acquire/release semantics: fresh, re-entrant refresh, foreign conflict, expiry break, corrupt lock") {
    val path = tmpDir("sem")
    // fresh acquire owns the release
    assert(WriterLease.acquire(spark, path, owner = "a"))
    val h1 = WriterLease.holder(spark, path).get
    assert(h1.owner == "a")
    // re-entrant: same owner, expiry refreshed (longer ttl), NOT fresh
    assert(!WriterLease.acquire(spark, path, owner = "a",
      ttlMs = WriterLease.DefaultTtlMs * 2))
    assert(WriterLease.holder(spark, path).get.expiresAtMs > h1.expiresAtMs)
    // a second live writer fails loudly
    intercept[java.util.ConcurrentModificationException] {
      WriterLease.acquire(spark, path, owner = "b")
    }
    // releasing someone else's lease is a caller bug
    intercept[IllegalStateException] { WriterLease.release(spark, path, "b") }
    // DEPTH-BALANCED: two acquires need two releases — the first drops
    // one hold (lock stays, an overlapping same-owner restart is never
    // stranded), the second frees the lock
    WriterLease.release(spark, path, "a")
    assert(WriterLease.holder(spark, path).exists(_.owner == "a"),
      "one release of a doubly-held lease must keep the lock")
    WriterLease.release(spark, path, "a")
    assert(WriterLease.holder(spark, path).isEmpty)
    WriterLease.release(spark, path, "a") // idempotent on absent

    // a crashed holder (expired lock) no longer blocks
    assert(WriterLease.acquire(spark, path, owner = "dead", ttlMs = -1L))
    assert(WriterLease.acquire(spark, path, owner = "b"),
      "an expired lease must break, not wedge the table")
    assert(WriterLease.holder(spark, path).get.owner == "b")
    WriterLease.release(spark, path, "b")

    // a torn lock file (crash mid-create) reads as expired: next
    // writer breaks it instead of wedging
    val lp = new org.apache.hadoop.fs.Path(path + ".writer_lock")
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lp, true); out.write("garbage".getBytes); out.close()
    assert(WriterLease.acquire(spark, path, owner = "c"))
    WriterLease.release(spark, path, "c")
  }

  test("withLease: body runs under the lock, releases on success AND failure, nested same-owner holds keep the outer lease") {
    val path = tmpDir("wl")
    val got = WriterLease.withLease(spark, path, owner = "a") {
      assert(WriterLease.holder(spark, path).get.owner == "a")
      // nested same-owner hold re-enters; its exit must NOT drop the lease
      WriterLease.withLease(spark, path, owner = "a")(())
      assert(WriterLease.holder(spark, path).get.owner == "a",
        "a nested re-entrant hold must not release the outer lease")
      42
    }
    assert(got == 42 && WriterLease.holder(spark, path).isEmpty)
    // a FAILED body still releases (retry immediately; replay
    // convergence makes the retry correct)
    intercept[RuntimeException] {
      WriterLease.withLease(spark, path, owner = "a")(throw new RuntimeException("boom"))
    }
    assert(WriterLease.holder(spark, path).isEmpty)
  }

  test("upsertBuckets under a foreign lease: fails loudly BEFORE touching state; proceeds after release") {
    val path = tmpDir("ub")
    StoredMerge.writeBuckets(Seq((1L, "v1"), (2L, "v2")).toDF("k", "v"),
      path, Seq("k"), nBuckets = 4)
    def stateBytes(): Map[String, Long] = {
      val root = java.nio.file.Paths.get(path)
      val files = java.nio.file.Files.walk(root).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      files.map(f => f -> java.nio.file.Files.size(java.nio.file.Paths.get(f))).toMap
    }
    val before = stateBytes()
    WriterLease.acquire(spark, path, owner = "other-job")
    intercept[java.util.ConcurrentModificationException] {
      StoredMerge.upsertBuckets(spark, path,
        Seq((1L, "CLOBBER")).toDF("k", "v"), Seq("k"), nBuckets = 4,
        owner = "me")
    }
    assert(stateBytes() == before,
      "a refused merge must leave every stored file byte-identical")
    WriterLease.release(spark, path, "other-job")
    StoredMerge.upsertBuckets(spark, path,
      Seq((1L, "v1b")).toDF("k", "v"), Seq("k"), nBuckets = 4, owner = "me")
    val rows = StoredMerge.readBuckets(spark, path).drop("__bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "v1b", 2L -> "v2"))
  }
}
