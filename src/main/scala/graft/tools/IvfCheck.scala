package graft
import org.apache.spark.sql.SparkSession
object IvfCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.queries.Queries.all("q33_ivf_recall")(spark, args(0))
    df.show(20, false)
    val rec = df.agg(org.apache.spark.sql.functions.avg("recall_at_5")).head().getDouble(0)
    println(f"mean recall@5 = $rec%.3f  elapsed=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
