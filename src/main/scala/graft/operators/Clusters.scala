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
                          hotThreshold: Long = 1L << 20,
                          localLimit: Long = 1L << 22): DataFrame = {
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

    // Hybrid fast path: the star rounds are LATENCY-bound, not
    // data-bound — each alternation costs a fixed fleet of shuffles
    // regardless of edge count, and small graphs (a daily increment's
    // contracted rep graph in [[appendClusters]], any corpus whose
    // near-dup pair set is modest) pay ~8 rounds of job overhead to
    // move kilobytes. When the DEDUPLICATED edge count (already known
    // from the convergence signature — no extra job) fits the driver
    // comfortably (default 2^22 edges = 64 MB of longs), run a single
    // union-find pass over a streamed local iterator instead: one job,
    // exact same (id, min-id component) contract. Anything larger takes
    // the distributed rounds — the 100 TB path is unchanged, and the
    // threshold bounds driver memory explicitly the way the k-means
    // sample and top-K merge collects elsewhere in this repo do.
    // `localLimit = 0` forces the iterative path (specs pin both).
    if (last._2 <= localLimit) return localComponents(e)

    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // exactly ONE alternation round per materialization: each star
      // references its input several times (symmetric view + min join
      // + hot/cold legs), so an un-checkpointed second round multiplies
      // the logical plan ~100× — plan-string work alone then dwarfs
      // the data work (measured: OOM in explainString at 2 rounds)
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

  /** Driver union-find over a small, already-deduplicated edge frame:
    * path-compressed find, union by min id (the smaller root becomes
    * parent, so every root IS its component's minimum — the same
    * representative contract the star rounds converge to). Edges stream
    * through `toLocalIterator` partition-by-partition; the result goes
    * back out via `parallelize`, never a plan-embedded LocalRelation.
    */
  private def localComponents(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val parent = new java.util.HashMap[Long, Long]()
    val nodes = new java.util.HashSet[Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { x = p; p = parent.getOrDefault(x, x) }
      var y = x0
      while (y != x) { val n = parent.get(y); parent.put(y, x); y = n }
      x
    }
    val it = e.select(col("u"), col("v")).toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val a = r.getLong(0); val b = r.getLong(1)
      nodes.add(a); nodes.add(b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val out = new Array[(Long, Long)](nodes.size)
    val nit = nodes.iterator()
    var i = 0
    while (nit.hasNext) {
      val id = nit.next()
      out(i) = (id, find(id))
      i += 1
    }
    val slices = math.max(1, out.length / 500000)
    import spark.implicits._
    spark.createDataset(spark.sparkContext.parallelize(out.toIndexedSeq, slices))
      .toDF("id", "component")
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

  /** Incremental clustering — the accretion leg of the stored-model
    * family ([[DedupIndex]], [[IvfIndex]], [[graft.operators.Bm25Index]],
    * [[NgramLM]]): a stored `(doc_id, cluster)` assignment absorbs a new
    * batch WITHOUT re-clustering the corpus.
    *
    * Key invariant (established by [[dedupClusters]] and preserved
    * here): every stored cluster id IS the minimum doc_id of its
    * cluster — i.e. cluster ids are their own representatives. An
    * incoming edge's endpoints therefore contract to representatives
    * (stored docs → their cluster id, batch docs → themselves), and
    * connected components run over the REPRESENTATIVE edge graph:
    * O(|batch pairs|) edges total, regardless of corpus size. A batch
    * doc bridging two stored clusters unifies them transitively, the
    * same merge a full re-cluster would make.
    *
    * Scale shape — the stored table is scanned, never shuffled:
    *  - endpoint→rep resolution joins stored against the DISTINCT edge
    *    endpoints (≤ 2·|pairs| longs, broadcast);
    *  - relabeling joins stored against the rep→root map (≤ touched
    *    clusters + batch ids, broadcast); untouched rows coalesce
    *    through unchanged.
    * Everything shuffled is O(batch). Both broadcasts are bounded by
    * the batch pair count — the daily increment, not the corpus.
    *
    * Returns the updated full assignment `(doc_id, cluster, keep)` —
    * byte-identical to [[dedupClusters]] over the union of all docs and
    * all pairs (spec-proven), because component minima agree: the
    * stored rep is already its cluster's min, and min over reps = min
    * over members.
    */
  def appendClusters(stored: DataFrame, batchDocs: DataFrame, idCol: String,
                     pairs: DataFrame): DataFrame = {
    val pcols = pairs.columns
    val e = pairs
      .select(col(pcols(0)).cast("long").as("a"), col(pcols(1)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val st = stored.select(col("doc_id").cast("long").as("doc_id"),
      col("cluster").cast("long").as("cluster"))

    // endpoint → representative (stored docs only; batch docs are their
    // own rep). Stored side: broadcast hash join against the endpoint
    // set — scan, no exchange.
    val endpoints = e.select(col("a").as("doc_id"))
      .union(e.select(col("b").as("doc_id"))).distinct()
    val endpointRep = st.join(broadcast(endpoints), Seq("doc_id"))

    val repEdges = e
      .join(broadcast(endpointRep.select(col("doc_id").as("a"), col("cluster").as("ra"))),
        Seq("a"), "left")
      .join(broadcast(endpointRep.select(col("doc_id").as("b"), col("cluster").as("rb"))),
        Seq("b"), "left")
      .select(coalesce(col("ra"), col("a")).as("id_a"),
        coalesce(col("rb"), col("b")).as("id_b"))

    // components over the contracted graph: nodes are touched stored
    // reps + batch ids that appear in any pair
    val comps = connectedComponents(repEdges)

    val storedNew = st
      .join(broadcast(comps.select(col("id").as("cluster"), col("component").as("__new"))),
        Seq("cluster"), "left")
      .select(col("doc_id"), coalesce(col("__new"), col("cluster")).as("cluster"))
    // resend guard: a batch doc already present in `stored` keeps its
    // stored row (the reference's duplicate-admission semantics) —
    // without this a re-sent id would emit TWO assignment rows. The
    // already-stored subset is found by one more broadcast-probed scan
    // of the stored table (scan, never shuffle — same as endpointRep).
    val batchIds = batchDocs.select(col(idCol).cast("long").as("doc_id"))
    val resent = st.join(broadcast(batchIds), Seq("doc_id"))
      .select(col("doc_id"))
    val batchNew = batchIds
      .join(broadcast(resent), Seq("doc_id"), "left_anti")
      .join(broadcast(comps.select(col("id").as("doc_id"), col("component").as("__new"))),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__new"), col("doc_id")).as("cluster"))

    storedNew.union(batchNew)
      .withColumn("keep", col("cluster") === col("doc_id"))
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

  /** Survivorship by QUALITY instead of id: each duplicate cluster
    * keeps its best document under (`scoreCol` desc, doc_id asc) — the
    * policy real curation pipelines want (keep the longest / highest-
    * quality copy, not the one that happened to crawl first). `score`
    * must be numeric; ties settle on the smaller id, so the choice is
    * total and engine-reproducible.
    *
    * Scale shape: representative selection is ONE hash aggregate —
    * `min(struct(-score, doc_id))` combines map-side, so a mega-cluster
    * (the boilerplate component with millions of members) costs one
    * partial row per map task, where the tempting
    * `row_number() OVER (PARTITION BY cluster ORDER BY ...)` would pull
    * the whole cluster through a single task's sort (the q74 lesson).
    * Returns `(doc_id, cluster, rep, keep)`; `cluster` stays the
    * component min-id from [[dedupClusters]] so assignments remain
    * comparable across survivorship policies.
    */
  def survivorshipBy(docs: DataFrame, idCol: String, scoreCol: String,
                     pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    val assigned = docs
      // keep the score's NATIVE numeric type: casting to long would
      // truncate fractional scores (0.73 vs 0.31 → both 0) and
      // silently collapse the policy into id-order ties
      .select(col(idCol).cast("long").as("doc_id"),
        col(scoreCol).as("__score"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
    val reps = assigned.groupBy(col("cluster"))
      .agg(min(struct((-col("__score")).as("ns"), col("doc_id").as("id"))).as("m"))
      .select(col("cluster"), col("m.id").as("rep"))
    assigned.join(reps, Seq("cluster"))
      .select(col("doc_id"), col("cluster"), col("rep"),
        (col("doc_id") === col("rep")).as("keep"))
  }
}
