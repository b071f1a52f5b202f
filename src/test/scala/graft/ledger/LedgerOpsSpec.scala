package graft.ledger

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.ops.Ops
import graft.crypto.Keystore

class LedgerOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshLedger() = new Ledger(spark, Files.createTempDirectory("graft-ledger").toString)

  private def rec(id: String, status: BatchStatus, files: Seq[String] = Seq("b/k/f1.csv"),
                  at: Long = System.currentTimeMillis()) =
    BatchRecord("b/k", id, status.name, files.map(BatchEntry(_, 10, at)), 10L * files.size, at)

  test("ledger: latest event wins; describe and status query (§2.9)") {
    val ledger = new Ledger(spark, Files.createTempDirectory("graft-ledger").toString)
    ledger.appendBatch(rec("b1", BatchStatus.Open, at = 1000))
    ledger.appendBatch(rec("b1", BatchStatus.Locked, at = 2000))
    ledger.appendBatch(rec("b1", BatchStatus.Complete, at = 3000))
    ledger.appendBatch(rec("b2", BatchStatus.Open, at = 2500))
    assert(ledger.currentBatches.count() == 2)
    val d = ledger.describeBatch("b/k", "b1").collect()
    assert(d.length == 1 && d.head.getAs[String]("status") == "complete")
    assert(ledger.queryBatches("open").collect().map(_.getAs[String]("batchId")).toSeq == Seq("b2"))
    // time-range form of the GSI query
    assert(ledger.queryBatches("complete", afterMs = Some(2500)).count() == 1)
    assert(ledger.queryBatches("complete", beforeMs = Some(2500)).count() == 0)
  }

  test("ops: unlock requires locked|error (F6 preconditions)") {
    val ledger = freshLedger()
    val ops = new Ops(spark, ledger)
    ledger.appendBatch(rec("b1", BatchStatus.Locked))
    assert(ops.unlockBatch("b/k", "b1").ok)
    // now open — second unlock must refuse, like the conditional write
    assert(!ops.unlockBatch("b/k", "b1").ok)
    assert(!ops.unlockBatch("b/k", "missing").ok)
  }

  test("ops: reprocessBatch guards + omit list + reinject files (T7)") {
    val ledger = freshLedger()
    val ops = new Ops(spark, ledger)
    ledger.appendBatch(rec("open1", BatchStatus.Open))
    assert(!ops.reprocessBatch("b/k", "open1").ok)

    ledger.appendBatch(rec("err1", BatchStatus.Error, Seq("b/k/f1.csv", "b/k/f2.csv", "b/k/f3.csv")))
    val r = ops.reprocessBatch("b/k", "err1", omitFiles = Set("b/k/f2.csv"))
    assert(r.ok && r.reinject == Seq("b/k/f1.csv", "b/k/f3.csv"))
    assert(ledger.describeBatch("b/k", "err1").collect().head.getAs[String]("status") == "reprocessed")
    // repeated reprocess refused (reference CAS: locked|error only) —
    // prevents double-loading an already-reprocessed batch
    assert(!ops.reprocessBatch("b/k", "err1").ok)
    ledger.appendBatch(rec("done1", BatchStatus.Complete))
    assert(!ops.reprocessBatch("b/k", "done1").ok)
  }

  test("ops: deleteBatches dry-run by default, tombstones when forced") {
    val ledger = freshLedger()
    val ops = new Ops(spark, ledger)
    ledger.appendBatch(rec("c1", BatchStatus.Complete))
    val dry = ops.deleteBatches("complete")
    assert(dry.count() == 1)
    assert(ledger.queryBatches("complete").count() == 1) // untouched
    ops.deleteBatches("complete", dryRun = false)
    assert(ledger.queryBatches("complete").count() == 0)
  }

  test("ops: reprocessFile unlinks batch into previousBatches (common.js:842-916)") {
    val ledger = freshLedger()
    val ops = new Ops(spark, ledger)
    ledger.appendFile(ProcessedFile("b/k/f1.csv", 1000, 1, Some("batchA")), 1000)
    val r = ops.reprocessFile("b/k/f1.csv")
    assert(r.ok && r.reinject == Seq("b/k/f1.csv"))
    val cur = ledger.processedFiles.collect().head
    assert(cur.getAs[String]("batchId") == "")
    assert(cur.getAs[scala.collection.Seq[String]]("previousBatches").toSeq == Seq("batchA"))
    assert(!ops.reprocessFile("b/k/unknown.csv").ok)
  }

  test("keystore: AES-GCM round-trips single/array/map; wrong context fails (kmsCrypto parity)") {
    val dir = Files.createTempDirectory("graft-keys").toString
    val ks = Keystore(dir)
    val ct = ks.encrypt("secret-password")
    assert(ct != "secret-password" && ks.decrypt(ct) == "secret-password")
    // fresh ciphertexts differ (random IV) but both decrypt
    val ct2 = ks.encrypt("secret-password")
    assert(ct != ct2 && ks.decrypt(ct2) == "secret-password")
    assert(ks.decryptAll(ks.encryptAll(Seq("a", "b"))) == Seq("a", "b"))
    assert(ks.decryptMap(ks.encryptMap(Map("u" -> "p"))) == Map("u" -> "p"))
    // same key file, different AAD context → auth failure, like
    // mismatched KMS EncryptionContext
    val other = new Keystore(java.nio.file.Paths.get(dir, "graft-master.key"), "other-module")
    intercept[Exception](other.decrypt(ct))
  }

  test("ops: resetCurrentBatch clears the config marker (resetCurrentBatch.js parity)") {
    val store = new graft.config.ConfigStore(
      Files.createTempDirectory("graft-rcb").toString)
    store.put(LoadConfig(s3Prefix = "b/k", currentBatch = "b-123"))
    val ops = new Ops(spark, freshLedger())
    assert(ops.resetCurrentBatch(store, "b/k").ok)
    assert(store.get("b/k").get.currentBatch == "")
    assert(!ops.resetCurrentBatch(store, "missing").ok)
  }
}
