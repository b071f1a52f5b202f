package graft.ops

import org.apache.spark.sql.SparkSession

/** Standalone command-line entry for the §2.9 operational surface — the
  * reference ships each of these as its own script (`describeBatch.js`,
  * `queryBatches.js`, `unlockBatch.js`, `deleteBatch.js`,
  * `deleteBatches.js`, `processedFiles.js`, `reprocessBatch.js`,
  * `resetCurrentBatch.js`, `encryptValue.js`); here one thin main
  * dispatches to the [[Ops]]/[[graft.ledger.Ledger]]/
  * [[graft.crypto.Keystore]] methods those scripts map to.
  *
  * Usage: OpsCli <ledgerDir> <command> [args...]
  *
  *   describeBatch  <prefix> <batchId>
  *   queryBatches   <status> [afterMs] [beforeMs]
  *   unlockBatch    <prefix> <batchId>
  *   reprocessBatch <prefix> <batchId> [omitFile,omitFile,...]
  *   deleteBatch    <prefix> <batchId>
  *   deleteBatches  <status> [--force] [afterMs] [beforeMs]
  *   processedFiles --query <file>
  *                  --delete <file>
  *                  --reprocess <file> [watchRoot]
  *                  --reprocessPrefix <watchRoot> <prefix> [regex]
  *   resetCurrentBatch <configDir> <prefix>
  *   encryptValue   <keyPath> <value>
  */
object OpsCli {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) { System.err.println(usage); sys.exit(2) }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-ops")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exit =
      try run(spark, new Ops(spark, new graft.ledger.Ledger(spark, args(0))),
        args(1), args.drop(2).toList)
      finally spark.stop()
    sys.exit(exit)
  }

  /** Dispatch one command; returns the process exit code. Split from
    * main so specs can drive the CLI without forking a JVM. */
  def run(spark: SparkSession, ops: Ops, command: String, rest: List[String]): Int = {
    def report(r: ops.OpResult): Int = {
      println(r.message)
      r.reinject.foreach(println)
      if (r.ok) 0 else 1
    }
    (command, rest) match {
      case ("describeBatch", prefix :: id :: Nil) =>
        val rows = ops.describeBatch(prefix, id)
        rows.show(truncate = false)
        if (rows.isEmpty) 1 else 0
      case ("queryBatches", status :: tail) =>
        ops.queryBatches(status,
          tail.headOption.map(_.toLong), tail.lift(1).map(_.toLong))
          .show(numRows = 1000, truncate = false)
        0
      case ("unlockBatch", prefix :: id :: Nil) =>
        report(ops.unlockBatch(prefix, id))
      case ("reprocessBatch", prefix :: id :: tail) =>
        report(ops.reprocessBatch(prefix, id,
          tail.headOption.map(_.split(",").toSet).getOrElse(Set.empty)))
      case ("deleteBatch", prefix :: id :: Nil) =>
        val (r, old) = ops.deleteBatch(prefix, id)
        old.foreach(ev => println(s"ALL_OLD: $ev"))
        report(r)
      case ("deleteBatches", status :: tail) =>
        val force = tail.contains("--force")
        val times = tail.filterNot(_ == "--force")
        val doomed = ops.deleteBatches(status, dryRun = !force,
          times.headOption.map(_.toLong), times.lift(1).map(_.toLong))
        doomed.show(numRows = 1000, truncate = false)
        if (!force) println("dry run — pass --force to delete")
        0
      case ("processedFiles", "--query" :: file :: Nil) =>
        val rows = ops.queryProcessedFile(file)
        rows.show(truncate = false)
        if (rows.isEmpty) 1 else 0
      case ("processedFiles", "--delete" :: file :: Nil) =>
        val (r, old) = ops.deleteProcessedFile(file)
        old.foreach(row => println(s"ALL_OLD: $row"))
        report(r)
      case ("processedFiles", "--reprocess" :: file :: tail) =>
        report(ops.reprocessFile(file, tail.headOption))
      case ("processedFiles", "--reprocessPrefix" :: watchRoot :: prefix :: tail) =>
        report(ops.reprocessPrefix(watchRoot, prefix, tail.headOption))
      case ("resetCurrentBatch", configDir :: prefix :: Nil) =>
        // reference: standalone resetCurrentBatch.js:79-152
        report(ops.resetCurrentBatch(
          new graft.config.ConfigStore(configDir), prefix))
      case ("encryptValue", keyPath :: value :: Nil) =>
        // reference: standalone encryptValue.js:26-64 — encrypt, then
        // decrypt-verify before printing the configuration-entry value
        val ks = new graft.crypto.Keystore(java.nio.file.Paths.get(keyPath))
        val ct = ks.encrypt(value)
        if (ks.decrypt(ct) == value) { println(ct); 0 }
        else { System.err.println("encryption completed but could not be validated"); 1 }
      case ("curationIngest", docsDir :: dedupTable :: lmTable :: offsetsPath ::
          scoreCut :: labeledDir :: manifestDir :: checkpointDir :: tail) =>
        // the engine's flagship composed job, CLI-reachable like every
        // other capability (the reference ships each of its jobs as a
        // standalone script). `--once` drains what the docs directory
        // currently holds and exits (Trigger.AvailableNow); without it
        // the job runs continuously on the default trigger.
        import graft.streaming.CurationIngest
        val once = tail.contains("--once")
        val cfg = CurationIngest.Config(dedupTable, lmTable, offsetsPath,
          scoreCut.toDouble)
        // first run on a fresh offsets path: seed the stored state
        val offRoot = new org.apache.hadoop.fs.Path(offsetsPath)
        val fs = offRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(offRoot)) CurationIngest.initOffsets(spark, cfg)
        val schema = spark.read.parquet(docsDir).schema
        val docs = spark.readStream.schema(schema).parquet(docsDir)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text"))
        val q = graft.Pipeline.startCurationIngest(spark, docs, cfg,
          labeledDir, manifestDir, checkpointDir, availableNow = once)
        q.awaitTermination()
        println(s"curation ingest ${if (once) "drained" else "stopped"}: " +
          s"labeled=$labeledDir manifest=$manifestDir")
        0
      case _ =>
        System.err.println(usage)
        2
    }
  }

  private val usage: String =
    """usage: OpsCli <ledgerDir> <command> [args...]
      |  describeBatch  <prefix> <batchId>
      |  queryBatches   <status> [afterMs] [beforeMs]
      |  unlockBatch    <prefix> <batchId>
      |  reprocessBatch <prefix> <batchId> [omitFile,...]
      |  deleteBatch    <prefix> <batchId>
      |  deleteBatches  <status> [--force] [afterMs] [beforeMs]
      |  processedFiles --query <file> | --delete <file> |
      |                 --reprocess <file> [watchRoot] |
      |                 --reprocessPrefix <watchRoot> <prefix> [regex]
      |  resetCurrentBatch <configDir> <prefix>
      |  encryptValue   <keyPath> <value>
      |  curationIngest <docsDir> <dedupTable> <lmTable> <offsetsPath>
      |                 <scoreCut> <labeledDir> <manifestDir> <checkpointDir> [--once]
      |""".stripMargin
}
