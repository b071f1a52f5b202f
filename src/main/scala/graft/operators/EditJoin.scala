package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join via deletion-neighborhood
  * blocking (the SymSpell/FastSS family — Bast et al.'s published
  * candidate-generation trick): two strings within Levenshtein
  * distance 1 ALWAYS share a key in
  * `{prefix(s)} ∪ {prefix(s) with one char deleted}` — a substitution
  * shares the deletion at its position, an insert/delete shares the
  * shorter string's prefix itself, and an edit beyond the prefix
  * shares the undeleted prefix key. Candidates then verify with the
  * exact codegen'd `levenshtein`, so the blocking only ever has to be
  * a SUPERSET — same candidate-prune-verify contract as the repo's
  * MinHash/SimHash legs ([[Dedup]]).
  *
  * Scale design (100 TB of strings): each string emits at most
  * `prefixLen + 1` keys (the prefix cap keeps the blowup independent
  * of string length); the join is a bucketed equi-join on the key —
  * no all-pairs leg anywhere, no cartesian. Per-key fan-in is bounded
  * by the near-duplicate cluster size around one deletion form;
  * pathological hot keys are the [[Skew]] hot/cold territory,
  * documented not defaulted. The per-pair distinct is a hash
  * aggregate on the (id_a, id_b) key.
  */
object EditJoin {

  /** Deletion-neighborhood blocking keys of the column named
    * `strField`: the first `prefixLen` chars plus each of their
    * single-deletion variants. Pure codegen'd expression work (no
    * UDF); exposed for specs.
    */
  def deletionKeys(strField: String, prefixLen: Int): Column =
    keysExpr(strField, prefixLen)

  /** All unordered pairs `(id_a, id_b)` with `id_a < id_b` whose
    * strings are within Levenshtein distance `maxDist` (1 or 2 —
    * candidate generation uses deletion order = maxDist on the
    * prefix). Output columns: `id_a, id_b, dist`.
    */
  def pairs(df: DataFrame, idCol: String, strCol: String,
            maxDist: Int = 1, prefixLen: Int = 12): DataFrame = {
    require(maxDist == 1, "deletion-neighborhood blocking shipped for maxDist = 1")
    val keyed = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("key", explode(keysExpr("s", prefixLen)))
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
    * strings): `prefix` itself plus each single-deletion variant,
    * guarded for the empty string (Spark's `sequence(1, 0)` DESCENDS,
    * so the transform must never see an empty prefix).
    */
  private def keysExpr(strField: String, prefixLen: Int): Column = expr(
    s"""CASE WHEN length(substring($strField, 1, $prefixLen)) = 0
       |  THEN array(substring($strField, 1, $prefixLen))
       |  ELSE array_union(
       |    array(substring($strField, 1, $prefixLen)),
       |    transform(sequence(1, length(substring($strField, 1, $prefixLen))),
       |      i -> concat(
       |        substring(substring($strField, 1, $prefixLen), 1, i - 1),
       |        substring(substring($strField, 1, $prefixLen), i + 1,
       |          length(substring($strField, 1, $prefixLen))))))
       |END""".stripMargin)
}
