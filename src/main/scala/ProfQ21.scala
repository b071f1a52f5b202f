import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

object ProfQ21 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    // stage a: simhash candidate pairs
    val cands = time("simhashPairs") {
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16, bands = 8)
        .select(col("id_a"), col("id_b"))
    }
    val candIds = time("candIds distinct") {
      val c = cands.select(col("id_a").as("doc_id"))
        .union(cands.select(col("id_b").as("doc_id"))).distinct()
      c.count(); c
    }
    val toks = time("pruned toks compute+persist") {
      val t = docs.select(col("doc_id"),
        graft.functions.expressions.hashed_set(
          array_distinct(graft.functions.expressions.shingles_fast(
            TextFunctions.tokens(col("text")), 2))).as("sh"))
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .persist()
      t.count(); t
    }
    time("fetch joins + jaccard") {
      cands
        .join(toks.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(toks.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", graft.functions.expressions.sorted_jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .count()
    }
    spark.stop()
  }
}
