package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys at 100 TB: explicit key salting.
  *
  * AQE's skew-join handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here); explicit
  * salting remains necessary when one side must be pre-aggregated per
  * key or when a single key exceeds what one task can hold even after
  * AQE splitting. The pattern: fact rows get a random-ish salt in
  * [0, salts); the dimension side is exploded ×salts; the join key
  * becomes (key, salt), spreading each hot key over `salts` tasks.
  *
  * Salt derives from deterministic row content (xxhash64 of all fact
  * columns) rather than rand() so retried tasks salt identically —
  * nondeterministic salting breaks task retry exactly-once.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Inner-join `fact` against a ONE-ROW-PER-KEY `lookup` when a
    * handful of keys can dominate (a mega-hub in a dedup graph: one
    * boilerplate cluster of millions): lookup rows whose `countCol` ≥
    * `hotThreshold` are BROADCAST, so the hot keys' fact rows join
    * map-side and never concentrate on one reducer; the cold majority
    * takes the normal keyed exchange with hot keys filtered out
    * map-side (anti-join against the broadcast hot-key set). Hot keys
    * number ≤ |fact| / hotThreshold by construction — a bounded, tiny
    * broadcast.
    *
    * Complements AQE's skew-join: AQE splits oversized partitions at
    * runtime, but only after the exchange materializes them; this
    * keeps the hub rows out of the exchange entirely, which is the
    * shape you want when one key exceeds a task's memory, not just its
    * fair share.
    */
  def hotColdLookupJoin(fact: DataFrame, lookup: DataFrame, key: String,
                        countCol: String, hotThreshold: Long): DataFrame = {
    val hot = broadcast(lookup.filter(col(countCol) >= hotThreshold).drop(countCol))
    val cold = lookup.filter(col(countCol) < hotThreshold).drop(countCol)
    fact.join(broadcast(hot.select(key)), Seq(key), "left_anti")
      .join(cold, key)
      .unionByName(fact.join(hot, key))
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * aggregate on (key, salt) first, then merge per key. Spark's hash
    * aggregate already does map-side partials; this helps when a single
    * key's partials still overwhelm one reducer (extreme hot keys).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Key-distribution skew profile — the DIAGNOSTIC for everything
    * else in this object: before shuffling on a key at 100 TB, measure
    * how concentrated it is. Per group, over the multiset of per-key
    * row counts: key count `n_keys`, row total `n_rows`, the heaviest
    * key (`max_count`, `top_key` — smallest key id among ties, so the
    * row is deterministic), and the Gini concentration index as the
    * exact rational `gini_num / gini_den`
    * (= [2·Σᵢ i·c₍ᵢ₎ − (m+1)·Σc] / [m·Σc] over counts sorted
    * ascending — 0 for a uniform key, → 1 for one dominant key).
    *
    * The rank fold NEVER sorts keys: counts contract to
    * COUNT-OF-COUNTS (distinct count values per group — tens of rows
    * even when the group has billions of keys), and a run of `f` tied
    * keys with count `v` starting after cumulative frequency `s`
    * contributes `v·(f·s + f·(f+1)/2)` to the rank sum in closed form.
    * The window rides that contraction partitioned by group; the key
    * aggregate and the argmax are plain hash aggregates — skew-safe
    * while measuring skew. Overflow: n_keys·n_rows must stay under
    * 2^63 (profile partitions/samples beyond).
    */
  def keyDistribution(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val g = col(groupCol)
    val perKey = df.groupBy(g, col(keyCol).as("k"))
      .agg(count(lit(1)).as("c"))
    val top = perKey.groupBy(g)
      .agg(min(struct((-col("c")).as("nc"), col("k").as("k"))).as("m"))
      .select(g, (-col("m.nc")).as("max_count"),
        col("m.k").cast("long").as("top_key"))
    val cofc = perKey.groupBy(g, col("c")).agg(count(lit(1)).as("f"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(g).orderBy(col("c"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = cofc
      .withColumn("s", coalesce(sum(col("f")).over(w), lit(0L)))
      .withColumn("rank_mass", // f·(f+1) is even: shiftright is the exact halve
        col("c") * (col("f") * col("s") +
          shiftright(col("f") * (col("f") + 1), 1)))
    ranked.groupBy(g)
      .agg(sum(col("f")).cast("long").as("n_keys"),
        sum(col("c") * col("f")).cast("long").as("n_rows"),
        sum(col("rank_mass")).cast("long").as("__rm"))
      .join(top, groupCol)
      .select(g, col("n_keys"), col("n_rows"), col("max_count"), col("top_key"),
        (lit(2L) * col("__rm") - (col("n_keys") + 1) * col("n_rows"))
          .as("gini_num"),
        (col("n_keys") * col("n_rows")).as("gini_den"))
  }

  /** Pre-join cardinality forecast — the sanity check BEFORE shuffling
    * two 100 TB tables on a key: the exact output row count and fan-out
    * profile of `a ⋈ b on key`, computed from the two per-key COUNT
    * tables (each one hash aggregate + a contraction-sized join) —
    * never the join itself. One row:
    *
    *   - `n_out` = Σ_k cₐ(k)·c_b(k) — the exact inner-join size —
    *     in DECIMAL(38,0) cast to BIGINT under a loud guard (a 2^63
    *     forecast IS the "do not run this join" answer);
    *   - `n_matched_keys`, `max_fanout` (the heaviest key's product,
    *     with the smallest key id among ties surfaced as `top_key`),
    *   - `n_left_only` / `n_right_only` — keys that would null-extend
    *     an outer join.
    *
    * A forecast ≫ max(|a|,|b|) says "many-to-many blow-up: rethink the
    * key or pre-aggregate"; max_fanout bounds the single hottest
    * task's share (the salting decision input for [[saltedJoin]]).
    */
  def joinForecast(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val ca = a.where(col(key).isNotNull)
      .groupBy(col(key).as("k")).agg(count(lit(1)).as("ca"))
    val cb = b.where(col(key).isNotNull)
      .groupBy(col(key).as("k")).agg(count(lit(1)).as("cb"))
    val joined = ca.join(cb, Seq("k"), "full_outer")
    val matched = joined.filter(col("ca").isNotNull && col("cb").isNotNull)
      .withColumn("prod", col("ca") * col("cb"))
    val topAgg = matched.agg(
      count(lit(1)).as("n_matched_keys"),
      sum(col("prod").cast("decimal(38,0)")).as("__n_out"),
      min(struct((-col("prod")).as("np"), col("k").cast("long").as("k"))).as("m"))
    val sides = joined.agg(
      coalesce(sum(when(col("cb").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_left_only"),
      coalesce(sum(when(col("ca").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_right_only"))
    topAgg.crossJoin(sides)
      .withColumn("n_out",
        when(col("__n_out") > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(lit("joinForecast: output exceeds 2^63 rows — do not run this join")).cast("long"))
          .otherwise(coalesce(col("__n_out").cast("long"), lit(0L))))
      .select(col("n_out"), col("n_matched_keys").cast("long").as("n_matched_keys"),
        coalesce((-col("m.np")).cast("long"), lit(0L)).as("max_fanout"),
        col("m.k").as("top_key"),
        col("n_left_only"), col("n_right_only"))
  }
}
