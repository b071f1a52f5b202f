package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Post-execution plan dump: runs each named query through the noop
  * sink (bench-identical session), then prints the FINAL adaptive
  * physical plan — the one with AQEShuffleRead coalesced partition
  * counts and runtime join-strategy rewrites that `explain` cannot
  * show before execution (guide §7.2). Usage:
  * runMain graft.tools.FinalPlan <sfDir> <query...>
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.drop(1).sameElements(Array("ALL")))
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      // the noop write wraps the plan in its own QueryExecution, so
      // execute the df's own tree (collect — results are small at test
      // SF) to drive ITS AdaptiveSparkPlanExec to the final plan
      df.collect()
      println(f"\n========== $n (noop ${(t1 - t0) / 1e9}%.2f s) ==========")
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.treeString
        case p => p.treeString
      }
      println(finalPlan.take(20000))
    }
    spark.stop()
  }
}
