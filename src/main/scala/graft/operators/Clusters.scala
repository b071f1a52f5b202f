package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate clustering: the step AFTER pair generation in a dedup
  * pipeline. [[Dedup]] emits near-duplicate PAIRS; a training-data
  * pipeline needs CLUSTERS — transitive groups with one survivor each
  * (A~B and B~C must collapse to ONE kept document even when A~C was
  * never emitted).
  *
  * Connected components use the alternating large-star / small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14): each round is two groupBy-join passes over the
  * edge set, and the edge set contracts toward star graphs pointing at
  * the component minimum in O(log n) rounds — no driver-side graph, no
  * assumption about component diameter (plain label propagation needs
  * diameter rounds; a chain of pairwise-overlapping crawl dumps breaks
  * it). Edges are (long, long) ids only: the shuffle never carries
  * documents.
  *
  * Each round materializes via `localCheckpoint` — without it the
  * iterated plan nests one join per round and the lineage blows up
  * Catalyst long before data size matters.
  */
object Clusters {

  /** Connected components over an undirected edge list. Input columns
    * are the first two columns of `edges` (any names); output is
    * `(id, component)` where `component` is the minimum node id in the
    * component. Nodes appearing only as isolated self-pairs are fine;
    * nodes absent from `edges` simply don't appear (join the node table
    * afterwards — [[dedupClusters]] does).
    *
    * Skew hardening: each star step joins the neighbor view to its
    * per-node minimum; a mega-hub (crawl dedup routinely produces one
    * boilerplate component of millions) would funnel all its neighbor
    * rows through one reducer. Nodes whose neighbor count reaches
    * `hotThreshold` instead take [[Skew.hotColdLookupJoin]]'s broadcast
    * leg — their rows join map-side, never entering the exchange. The
    * min aggregation itself is safe at any skew (partial_min combines
    * map-side: one row per key per map task reaches the reducer).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          hotThreshold: Long = 1L << 20): DataFrame = {
    val cols = edges.columns
    var e = edges.select(col(cols(0)).cast("long").as("src"), col(cols(1)).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("u"), least(col("src"), col("dst")).as("v"))
      .distinct()
      .localCheckpoint()

    // convergence signature: order-independent content hash + count
    // (bit_xor, not sum — ANSI mode would overflow a sum of xxhash64s)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }

    var last = sig(e)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      e = smallStar(largeStar(e, hotThreshold), hotThreshold).localCheckpoint()
      val s = sig(e)
      converged = s == last
      last = s
      it += 1
    }

    // at the fixpoint every edge is (member u → component-min v);
    // the min itself needs a self row
    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Large-star: every node connects its LARGER neighbors to the minimum
    * of its neighborhood (including itself). Operates on the symmetric
    * neighbor view; keeps canonical (larger, smaller) orientation.
    */
  private[operators] def largeStar(e: DataFrame,
                                   hotThreshold: Long = 1L << 20): DataFrame = {
    val nbrs = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy("u").agg(
      least(min(col("v")), col("u")).as("m"), count(lit(1)).as("__c"))
    Skew.hotColdLookupJoin(nbrs, mins, "u", "__c", hotThreshold)
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node connects its SMALLER neighbors (and itself)
    * to the minimum among them. Edges arrive in (larger u, smaller v)
    * orientation, so all of u's listed neighbors are < u.
    */
  private[operators] def smallStar(e: DataFrame,
                                   hotThreshold: Long = 1L << 20): DataFrame = {
    // one join, two projections of it: (v → m) for every smaller
    // neighbor (v ≥ m, both < u) plus (u → m) for the node itself
    val mins = e.groupBy("u").agg(min("v").as("m"), count(lit(1)).as("__c"))
    val joined = Skew.hotColdLookupJoin(e, mins, "u", "__c", hotThreshold)
    joined.select(col("v").as("u"), col("m").as("v"))
      .union(joined.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
  }

  /** Survivorship: assign every document its duplicate-cluster root and
    * a keep flag (the minimum id in each cluster survives; documents in
    * no pair are their own singleton cluster and survive).
    *
    * `pairs` is any near-dup pair frame — [[Dedup.minhashLSH]],
    * [[Dedup.simhashPairs]], [[Dedup.chunkDupPairs]] output all fit.
    */
  def dedupClusters(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("keep", col("cluster") === col("doc_id"))
      .select(col("doc_id"), col("cluster"), col("keep"))
  }
}
