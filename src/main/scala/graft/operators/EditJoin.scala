package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join via deletion-neighborhood
  * blocking (the FastSS / SymSpell family, Bast et al.'s published
  * candidate-generation trick): two strings within Levenshtein
  * distance 1 ALWAYS share a key in `{s} ∪ {del_i(s)}` over the FULL
  * string — a substitution at position i shares the deletion at i, an
  * insert/delete shares the shorter string itself, and equal strings
  * share their identity key. Candidates then verify with the exact
  * codegen'd `levenshtein`, so the blocking only ever has to be a
  * SUPERSET — the same candidate-prune-verify contract as the repo's
  * MinHash/SimHash legs ([[Dedup]]).
  *
  * The round-6 version capped the neighborhood to a 12-char PREFIX to
  * bound key count — measured catastrophic on common-prefix corpora
  * (`Customer#000…` names all share every prefix key, so the blocking
  * join degenerates to all-pairs: 305 s at sf0.1 vs 2 s for this
  * form). Full-string deletion keys keep selectivity on any corpus;
  * keys ride the shuffle as 8-byte `xxhash64` values (a hash
  * collision can only ADD a candidate — the verify step removes it —
  * never lose one, since equal variants hash equal).
  *
  * Scale design (100 TB of strings): each string of length L emits
  * L + 1 hashed keys (8 bytes each), so shuffle volume is ~8L bytes
  * per string — the same order as shuffling the strings themselves.
  * Per-key fan-in is the genuine near-duplicate cluster size around
  * one deletion form; no all-pairs leg anywhere, no cartesian. This
  * operator is for SHORT strings (names, titles, tokens, URLs);
  * near-dup over documents is MinHash territory ([[Dedup]]).
  * Pathological hot keys (a million copies of one string) are the
  * [[Skew]] hot/cold territory, documented not defaulted.
  */
object EditJoin {

  /** The full deletion neighborhood of the column named `strField` as
    * an array of strings: the string itself plus each single-deletion
    * variant, deduplicated (repeated chars collapse). Pure codegen'd
    * expression work (no UDF); exposed for specs.
    */
  def deletionKeys(strField: String): Column = keysExpr(strField)

  /** All unordered pairs `(id_a, id_b)` with `id_a < id_b` whose
    * strings are within Levenshtein distance `maxDist` (= 1; the
    * deletion-neighborhood completeness argument is per-edit). Output
    * columns: `id_a, id_b, dist`.
    */
  def pairs(df: DataFrame, idCol: String, strCol: String,
            maxDist: Int = 1): DataFrame = {
    require(maxDist == 1, "deletion-neighborhood blocking shipped for maxDist = 1")
    val keyed = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("key", explode(keysExpr("s")))
      .select(xxhash64(col("key")).as("key"), col("id"), col("s"))
    val a = keyed.select(col("key"), col("id").as("id_a"), col("s").as("s_a"))
    val b = keyed.select(col("key"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, Seq("key"))
      .filter(col("id_a") < col("id_b"))
      // length band: a cheap pre-verify prune (|len diff| > d is impossible)
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("s_a")).as("s_a"), first(col("s_b")).as("s_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  /** The blocking keys as a single expression column (array of
    * strings): the string itself plus each single-deletion variant,
    * guarded for the empty string (Spark's `sequence(1, 0)` DESCENDS,
    * so the transform must never see an empty input).
    */
  private def keysExpr(strField: String): Column = expr(
    s"""CASE WHEN length($strField) = 0 THEN array($strField)
       |  ELSE array_union(
       |    array($strField),
       |    transform(sequence(1, length($strField)),
       |      i -> concat(
       |        substring($strField, 1, i - 1),
       |        substring($strField, i + 1, length($strField)))))
       |END""".stripMargin)
}
