package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, expressions => gx}

/** EXACT set-similarity self-join via prefix filtering — the
  * distributed PPJoin/prefix-filter family (Chaudhuri et al. ICDE
  * 2006; Vernica, Carey, Li SIGMOD 2010): two shingle SETS with
  * Jaccard ≥ t must share an element among each one's
  * `n - ⌈t·n⌉ + 1` smallest elements under ANY global total order
  * (pigeonhole: fewer shared elements would cap the intersection
  * below t·max(n_a, n_b)). Candidates form only on PREFIX tokens —
  * the df-ascending order makes those the rarest shingles, so posting
  * lists stay short — then verify exactly with the codegen'd
  * [[graft.functions.SortedJaccard]] merge over the full hashed sets.
  * Where [[Dedup.minhashLSH]] trades recall for speed, this is the
  * EXACT join with the same no-all-pairs shape.
  *
  * The threshold is a RATIONAL `tNum/tDen`, so the prefix length is
  * integer arithmetic (`n - ((tNum·n + tDen - 1) div tDen) + 1`) —
  * no floating-point ceil at the pruning boundary, which is where a
  * half-ulp error would silently LOSE pairs.
  *
  * Scale design (100 TB): distinct (doc, shingle-hash) rows contract
  * the corpus once; the df join and the prefix candidate join are
  * both keyed on the 64-bit shingle hash; per-doc sorting is a
  * row-local `sort_array` over that document's own shingles. No
  * global rank window — the (df, hash) PAIR is the total order, so
  * ordering needs no contiguous rank assignment. Verification joins
  * are doc-keyed against the hashed-set contraction.
  */
object SetSimJoin {

  /** All unordered pairs with exact shingle-set Jaccard ≥ tNum/tDen.
    * Output: `id_a, id_b, jaccard` (id_a < id_b). Shingle sets follow
    * the [[Dedup.minhashLSH]] convention: distinct word `shingleN`-
    * grams, whole-text fallback below `shingleN` tokens.
    */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            tNum: Int, tDen: Int, shingleN: Int = 3): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val docSh = df
      .select(col(idCol).as("id"),
        explode(array_distinct(
          gx.shingles_fast(TextFunctions.tokens(col(textCol)), shingleN))).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))

    val dfreq = docSh.groupBy(col("h")).agg(count(lit(1)).as("df"))

    // per-doc (df, h)-sorted shingle array; prefix length by integer
    // ceiling so the prune can never lose a pair to FP rounding
    val sorted = docSh.join(dfreq, Seq("h"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("a"))
      .withColumn("n", size(col("a")))
      .withColumn("p",
        col("n") - expr(s"(($tNum * n + ${tDen - 1}) div $tDen)") + 1)

    val prefix = sorted
      .select(col("id"),
        explode(slice(col("a"), lit(1), greatest(col("p"), lit(1)))).as("e"))
      .select(col("id"), col("e.h").as("h"))

    val cand = prefix.select(col("h"), col("id").as("id_a"))
      .join(prefix.select(col("h"), col("id").as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    // exact verify over the full hashed sets (sorted-merge, no per-pair
    // hash-set allocation)
    val sets = df
      .select(col(idCol).as("id"),
        gx.hashed_set(array_distinct(
          gx.shingles_fast(TextFunctions.tokens(col(textCol)), shingleN))).as("set"))
    cand
      .join(sets.select(col("id").as("id_a"), col("set").as("set_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("set").as("set_b")), Seq("id_b"))
      .withColumn("jaccard", gx.sorted_jaccard(col("set_a"), col("set_b")))
      .filter(col("jaccard") >= lit(tNum.toDouble / tDen))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
