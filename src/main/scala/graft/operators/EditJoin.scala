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

  /** The PassJoin-style constant-key alternative to [[pairs]] for
    * LONG strings (Li, Deng, Feng, ICDE 2011 — segment-based
    * pigeonhole blocking): a single edit splits an alignment into an
    * untouched prefix and an untouched suffix, so two strings within
    * distance 1 agree on the INDEX string's first-half prefix or
    * second-half suffix. Each string emits 2 index keys (its own
    * halves) and ≤ 6 probe keys (prefix/suffix cuts for the three
    * candidate lengths) — O(1) keys per string versus [[pairs]]'
    * O(L), so shuffle volume stays ~4 string-copies regardless of
    * string length. Same candidate-prune-verify contract; output is
    * row-identical to [[pairs]] (spec-pinned).
    *
    * Selectivity caveat (why [[pairs]] stays the default): the keys
    * are half-length substrings, so corpora whose strings share a
    * long common TEMPLATE (ids with a fixed prefix) collapse onto hot
    * first-half keys — the [[Skew]] hot/cold composition is the
    * remedy there. On natural long text (titles, sentences, URLs)
    * half-strings are selective and this path wins.
    */
  def pairsSegmented(df: DataFrame, idCol: String, strCol: String,
                     maxDist: Int = 1): DataFrame = {
    require(maxDist == 1, "segment blocking shipped for maxDist = 1")
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
    val idx = base
      .withColumn("key", explode(expr(
        """array(
          |  named_struct('m', length(s), 'seg', 1,
          |    'k', substring(s, 1, length(s) div 2)),
          |  named_struct('m', length(s), 'seg', 2,
          |    'k', substring(s, length(s) div 2 + 1,
          |           length(s) - length(s) div 2)))""".stripMargin)))
    val probeParts = (-1 to 1).flatMap { dm =>
      val M = s"(length(s) + ($dm))"
      val m1 = s"($M div 2)"
      val m2 = s"($M - $m1)"
      Seq(
        s"""IF($M >= 0 AND length(s) >= $m1,
           |  named_struct('m', $M, 'seg', 1, 'k', substring(s, 1, $m1)),
           |  NULL)""".stripMargin,
        s"""IF($M >= 0 AND length(s) >= $m2,
           |  named_struct('m', $M, 'seg', 2,
           |    'k', substring(s, length(s) - $m2 + 1, $m2)),
           |  NULL)""".stripMargin)
    }
    val probe = base
      .withColumn("key", explode(expr(
        s"filter(array(${probeParts.mkString(",")}), x -> x IS NOT NULL)")))
    val cand = probe
      .select(xxhash64(col("key.m"), col("key.seg"), col("key.k")).as("bk"),
        col("id").as("id_p"), col("s").as("s_p"))
      .join(idx.select(
          xxhash64(col("key.m"), col("key.seg"), col("key.k")).as("bk"),
          col("id").as("id_i"), col("s").as("s_i")),
        Seq("bk"))
      .filter(col("id_p") =!= col("id_i"))
      .select(least(col("id_p"), col("id_i")).as("id_a"),
        greatest(col("id_p"), col("id_i")).as("id_b"),
        when(col("id_p") < col("id_i"), col("s_p")).otherwise(col("s_i")).as("s_a"),
        when(col("id_p") < col("id_i"), col("s_i")).otherwise(col("s_p")).as("s_b"))
    cand
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
