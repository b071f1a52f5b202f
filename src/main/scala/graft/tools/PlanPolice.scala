package graft.tools

import org.apache.spark.sql.SparkSession

/** Survey helper: print, for every declared query, whether its physical
  * plan contains a cartesian/nested-loop join, an unpartitioned window,
  * or a window partitioned by a named column — the raw material for the
  * plan-police whitelist. `runMain graft.tools.PlanPolice <sfDir>`.
  */
object PlanPolice {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val p = df.queryExecution.sparkPlan
        val cartesian = p.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
          case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
        }
        val windows = p.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            if (w.partitionSpec.isEmpty) "GLOBAL"
            else w.partitionSpec.flatMap(_.references.map(_.name)).mkString("+")
        }
        println(s"PLANPOLICE $name cartesian=${cartesian.size} windows=[${windows.mkString(",")}]")
      } catch {
        case e: Throwable => println(s"PLANPOLICE $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
