package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of every declared
  * query and flags scale smells — missing pushdown, unexpected
  * cartesians, missing broadcasts, codegen gaps. Run per round after
  * correctness is green (builder prompt: ".explain('formatted') the plan
  * and iterate until it's the plan you'd want").
  *
  * Usage: runMain graft.tools.ExplainAll [sfDir] [queryName...]
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(plan)
        // NB: formatted mode under AQE omits WholeStageCodegen markers, so
        // codegen coverage can't be string-checked here; verify via simple
        // mode (`df.explain()`) when needed.
        val exchanges = "Exchange".r.findAllIn(plan).size
        val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
        println(s"--- shuffles=${exchanges - broadcasts} broadcasts=$broadcasts")
        if (plan.contains("CartesianProduct"))
          println(s"!!! SMELLS[$name]: CartesianProduct (verify it's an intended cross join)")
      }
    spark.stop()
  }
}
