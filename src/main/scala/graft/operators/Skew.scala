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
}
