package graft.tools

import org.apache.spark.sql.SparkSession

/** Deep-merge BPE fit diagnostic:
  * `runMain graft.tools.BpeFitBench [sfDir] [numMerges] [exact|approx]`.
  *
  * The word-level vocab on the synthetic corpus saturates at ~89 merges
  * (everything fully merged), so this fits at DOCUMENT granularity —
  * each doc's first 512 chars as one symbol sequence — the same
  * operator under a pair space rich enough for production-size merge
  * tables. Measured on sf0.1 at batch=64 (local[32]):
  * exact parity mode 1024 merges / 564 rounds / ~440 s (Zipfian ties
  * collapse the strict margin); approximate mode 1024 merges /
  * 36 rounds / ~275 s — the O(numMerges/batch) scale path.
  */
object BpeFitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(1024)
    val exact = args.lift(2).contains("exact")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val words = docs.select("text").as[String]
      .map(t => graft.operators.BpeFit.SymWord(t.take(512).map(_.toString), 1L))
    val t0 = System.nanoTime()
    val (merges, rounds) = graft.operators.BpeFit.fitWithRounds(
      words, numMerges, minCount = 2L, exact = exact)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"BPEFIT exact=$exact merges=${merges.length} rounds=$rounds time=$secs%.1f s")
    spark.stop()
  }
}
