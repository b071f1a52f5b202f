package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, expressions => gx}

/** Pairwise corpus-overlap profiling: the EXACT n-gram Jaccard
  * similarity between every pair of corpus groups (sources, dumps,
  * snapshots) — the standard contamination/redundancy audit run
  * before mixing training sources (the n-gram Jaccard family named
  * alongside MinHash in the dedup literature; cf. Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better").
  * Reference analogue: none (extends [[Dedup]]/[[Contamination]]).
  *
  * Scale design (100 TB): the corpus contracts to DISTINCT
  * (group, gram) rows first — a hash aggregate keyed on well-spread
  * gram hashes; documents never ride past the first shuffle. The
  * intersection join is gram-keyed: per gram the fan-in is the number
  * of GROUPS containing it (≤ |groups|, a handful by definition —
  * sources, not documents), so the pair explosion is bounded by
  * |groups|² per gram, never all-pairs over rows. Set sizes and
  * intersections are exact integers; Jaccard is one IEEE division —
  * the whole matrix hash-certifies against a DuckDB string-gram
  * replay. Spark carries 64-bit gram hashes through the shuffles
  * (the q46 convention: the string-gram oracle certifies the hashed
  * path end to end).
  */
object CorpusOverlap {

  /** Exact pairwise n-gram Jaccard matrix over groups. Output:
    * `group_a, group_b (group_a < group_b), n_a, n_b, n_common,
    * jaccard` — one row per unordered group pair with a non-empty
    * gram union (pairs with zero common grams included).
    */
  def jaccardMatrix(df: DataFrame, groupCol: String, textCol: String,
                    n: Int = 3): DataFrame = {
    val grams = df
      .select(col(groupCol).as("g"),
        explode(gx.shingles_fast(TextFunctions.tokens(col(textCol)), n)).as("gram"))
      .select(col("g"), xxhash64(col("gram")).as("gh"))
      .distinct()

    val sizes = grams.groupBy(col("g")).agg(count(lit(1)).as("n_grams"))

    val inter = grams.select(col("gh"), col("g").as("ga"))
      .join(grams.select(col("gh"), col("g").as("gb")), Seq("gh"))
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_common"))

    // all pairs (including zero-intersection ones) via the tiny sizes
    // table: a broadcast self-join over |groups| rows
    val a = sizes.select(col("g").as("ga"), col("n_grams").as("n_a"))
    val b = sizes.select(col("g").as("gb"), col("n_grams").as("n_b"))
    a.join(broadcast(b), col("ga") < col("gb"))
      .join(inter, Seq("ga", "gb"), "left")
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")))
  }
}
