package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph centrality over an edge table — PageRank in exact
  * fixed-point arithmetic, the third member of the repo's iterative
  * family next to [[Clusters]]' connected components and
  * [[Clusters.appendClusters]]' incremental contraction. Reference
  * analogue: none (the loader stops at COPY; this is the engine-side
  * graph analytics the landed event/linkage tables feed).
  *
  * Scale design (100 TB of edges): each iteration is the canonical
  * distributed PageRank plan — edges shuffled once on `src` to attach
  * rank/degree, once on `dst` for the contribution sum, nodes
  * left-joined for dangling targets; nothing collects, nothing is
  * partitioned on a low-cardinality key. Rounds materialize via
  * `localCheckpoint` under [[Clusters]]' one-round-per-checkpoint
  * invariant (an unbroken lineage re-references the edge relation per
  * round and plan-string work blows up ~exponentially).
  *
  * Exactness: ranks ride BIGINT micro-units with the repo's cleared
  * rational convention — `r₀ = scale`, each round
  * `r'(v) = baseMicro + (dampNum · Σ_{u→v} (r(u) div deg(u))) div dampDen`
  * where `baseMicro = (scale · (dampDen − dampNum)) div dampDen`.
  * Every operation is integer, so a fixed iteration count yields
  * bit-identical ranks on any engine that replays the formula —
  * hash-certifiable, no float summation-order drift. (Classical
  * float PageRank is the same recurrence before clearing; the div
  * floor loses < 1 µunit per term, immaterial for ranking and exactly
  * reproduced by the oracle.)
  */
object Graphs {

  /** Fixed-point PageRank over distinct directed edges. Returns one
    * row per node: (`node`, `rank_micro`) after `iters` rounds.
    * Dangling nodes (no out-edges) simply contribute nothing — the
    * simplified (non-redistributing) formulation both engines replay.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
               scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum,
      "need iters >= 1 and 0 < dampNum < dampDen")
    // e is consumed by three non-identical subtrees (nodes union, the
    // degree aggregate, the eDeg join) — without the checkpoint the
    // upstream edge build (often a multi-table join) runs three times
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // pre-joining degree onto the edge table once keeps the per-round
    // work to rank-attach + contribution-sum (two shuffles, not three)
    val eDeg = e.join(deg, "src").localCheckpoint()
    val baseMicro = (scale * (dampDen - dampNum)) / dampDen
    var ranks = nodes.withColumn("rank_micro", lit(scale))
    for (_ <- 1 to iters) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank_micro div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(baseMicro) +
            expr(s"(${dampNum}L * coalesce(in_mass, 0L)) div ${dampDen}L"))
            .cast("long").as("rank_micro"))
        .localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank (Page et al. 1999 §6; the random surfer
    * teleports back to a SOURCE SET instead of everywhere) — "rank the
    * graph from THESE nodes' point of view": related-entity expansion,
    * trust propagation from a seed allowlist, topic-conditioned
    * importance. Same exact fixed-point integer recurrence as
    * [[pageRank]], with the teleport mass restricted to the sources:
    *   r'(v) = [v ∈ S]·baseMicro + (dampNum · Σ_{u→v} r(u) div deg(u)) div dampDen,
    * r₀ = scale on S, 0 elsewhere — so mass decays with graph distance
    * from S and a fixed `iters` is bit-identical on any engine (the
    * q114 hash-certification convention; the oracle unrolls rounds).
    *
    * Plan shape per round = [[pageRank]]'s exactly (two keyed shuffles
    * + localCheckpoint); the source flag rides the node table as one
    * broadcast-joined boolean. Returns (`node`, `rank_micro`) for
    * every node, sources included (0-mass nodes stay 0 until reached).
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           sources: DataFrame, iters: Int,
                           dampNum: Long = 85L, dampDen: Long = 100L,
                           scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum,
      "need iters >= 1 and 0 < dampNum < dampDen")
    // the pageRank consumption pattern: checkpoint the distinct edge
    // set once instead of re-running the upstream build per consumer
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint()
    val s0 = sources
      .select(col(sources.columns.head).as("node")).distinct()
      .withColumn("is_src", lit(true))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(broadcast(s0), Seq("node"), "left")
      .select(col("node"), coalesce(col("is_src"), lit(false)).as("is_src"))
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val eDeg = e.join(deg, "src").localCheckpoint()
    val baseMicro = (scale * (dampDen - dampNum)) / dampDen
    var ranks = nodes.withColumn("rank_micro",
      when(col("is_src"), lit(scale)).otherwise(lit(0L)))
    for (_ <- 1 to iters) {
      val contribs = eDeg
        .join(ranks.select(col("node").as("src"), col("rank_micro")), "src")
        .select(col("dst"), expr("rank_micro div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), col("is_src"),
          (when(col("is_src"), lit(baseMicro)).otherwise(lit(0L)) +
            expr(s"(${dampNum}L * coalesce(in_mass, 0L)) div ${dampDen}L"))
            .cast("long").as("rank_micro"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("rank_micro"))
  }

  /** Exact triangle count + global clustering coefficient over an
    * undirected edge table, via degree-ordered orientation (the
    * "compact-forward" scheme of Latapy 2008 / Suri-Vassilvitskii
    * WWW'11): every undirected edge points from its (degree, id)-
    * smaller endpoint to the larger under that total order. Each
    * triangle then has exactly ONE apex with two out-edges, so closed
    * wedges count triangles exactly once — and the apex out-degree is
    * bounded by O(√m), so no oriented neighborhood can blow up on a
    * hub (a star center's out-degree is ~0 after orientation; its
    * million spokes each point AT it). Closure runs EDGE-ITERATOR
    * style: per-source sorted out-adjacency arrays, then per oriented
    * edge (u→v) the common out-neighbors |N⁺(u) ∩ N⁺(v)| — each
    * triangle surfaces exactly once at its lowest edge. The
    * intersection walks the (bounded) arrays inside whole-stage
    * codegen, so the quadratic wedge set is never materialized and
    * NEVER shuffled: every exchange in the plan is m-sized (adjacency
    * build + two keyed joins), the property that makes this the
    * standard 100 TB triangle plan.
    *
    * Returns ONE row of exact integers: `n_nodes`, `n_edges` (distinct
    * undirected), `n_wedges` (paths of length 2 = Σ d(d−1)/2),
    * `n_triangles`, `n_closed_wedges` (= 3·triangles) — the global
    * clustering coefficient is the exact rational
    * n_closed_wedges / n_wedges, left un-divided so the row
    * hash-certifies with no float.
    */
  /** The census prologue every triangle operator shares: distinct
    * undirected edges (checkpointed — degrees, orientation and the
    * edge count all reuse it), per-node degrees, the oriented edge
    * table, and the compact-forward oriented adjacency — per-source
    * SORTED out-neighbor arrays under (degree, id) orientation, each
    * bounded O(√m).
    *
    * `materializeEdges`: the LIVE census consumes the oriented edge
    * table three times (adjacency build + both end-joins), so it
    * checkpoints; [[AdjacencyIndex.save]] consumes it once (the
    * adjacency build — stored readouts rebuild edges by exploding the
    * stored adjacency) and skips the materialization job. The
    * explode-instead-of-join form was ALSO measured for the live
    * census and REJECTED (~20% slower at sf0.1 — the kTruss lesson:
    * measure per call-site, never assume).
    *
    * `adj` comes back LAZILY PERSISTED (it feeds both end-joins;
    * Spark does not reuse common subtrees) — the CALLER owns the
    * release: materialize the small readout, then `adj.unpersist()`
    * (the Dedup.releaseAfter discipline, enforced suite-wide by
    * QueryPlanPoliceSpec's empty-cache sweep).
    */
  private[graft] def orientedAdjacency(edges: DataFrame, aCol: String,
      bCol: String, materializeEdges: Boolean = true)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint() // degrees + orientation + edge count all reuse it
    // node-sized, consumed by SEPARATE actions (both orientation legs,
    // the wedge readout, nodeTriangles' final join, and — in the stored
    // path — all three table writes). deg INTENTIONALLY recomputes from
    // the checkpointed `und` per consumer: a checkpoint here was
    // measured (r16) and REJECTED — it destroys the aggregate's
    // partitioning, forcing an extra exchange into q205's bucketed
    // writes (+3.5 s), while the recompute is one cheap union+agg over
    // the already-materialized und blocks
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val fwd = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val o0 = withDeg.select(
        when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"))
    val o = if (materializeEdges) o0.localCheckpoint() else o0
    val adj = o.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .persist()
    (und, deg, o, adj)
  }

  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // EDGE-ITERATOR closure (Chiba–Nishizeki / Schank-Wagner forward):
    // a triangle x<y<z in (degree, id) order carries oriented edges
    // x→y, x→z, y→z, so it is counted EXACTLY ONCE as
    // z ∈ N_out(x) ∩ N_out(y) at edge (x→y). Materializing per-source
    // out-adjacency ARRAYS and intersecting them per edge keeps every
    // exchange m-SIZED — the wedge-join formulation this replaces
    // shuffled the Σ d_out²/2 wedge set (41M rows on the co-purchase
    // graph), a set the intersection walks inside whole-stage codegen
    // without ever materializing. Compact-forward orientation bounds
    // every adjacency array at O(√m), so rows stay small and skew-safe
    // at any graph shape.
    val (und, deg, o, adj) = orientedAdjacency(edges, aCol, bCol)
    val tri = o
      .join(adj.select(col("src"), col("nbrs").as("nu")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), Seq("dst"))
      .select(size(array_intersect(col("nu"), col("nv"))).cast("long").as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
    val base = und.agg(count(lit(1)).as("n_edges"))
    // deg·(deg−1) is even, so a right shift is the exact halve — no
    // double division anywhere (the 2^53 cast-exactness rule)
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(shiftright(col("deg") * (col("deg") - 1), 1)).as("n_wedges"))
    // the census readout is ONE row: materialize it eagerly
    // (localCheckpoint — RDD blocks, never a cache-manager entry) and
    // release the m-sized adjacency cache before returning
    val out = nodeStats.crossJoin(base).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"), (col("n_triangles") * 3).as("n_closed_wedges"))
      .localCheckpoint()
    adj.unpersist(blocking = false)
    out
  }

  /** Multi-source BFS: exact hop distance from the nearest of a set of
    * source nodes, over directed distinct edges — reach/influence
    * radius queries ("everything within h hops of the flagged
    * accounts"). Classic frontier expansion: round h joins the
    * CURRENT frontier (nodes first reached at distance h) against the
    * edge table and anti-joins the visited set — both shuffles are
    * sized by the frontier and the visited set, never all-pairs, and
    * rounds stop at `maxDepth` or when the frontier empties (the
    * frontier count doubles as the convergence probe, one job per
    * round). Materialization per round via `localCheckpoint` under the
    * iterative-family invariant.
    *
    * Returns `(node, dist)` for every REACHED node (sources at 0);
    * unreached nodes are absent, as in [[Clusters.connectedComponents]].
    */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   sources: DataFrame, maxDepth: Int = 20,
                   localLimit: Long = 1L << 22): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint()
    val s0 = sources.select(col(sources.columns.head).cast("long").as("node"))
      .distinct()
    // rounds are LATENCY-bound (a fixed job fleet per hop regardless of
    // frontier size): small graphs take a single driver BFS instead —
    // the [[Clusters.connectedComponents]] fast-path contract, specs
    // pin both paths via localLimit = 0
    if (e.count() <= localLimit) return localBfs(e, s0, maxDepth)
    var visited = s0.withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      frontier = frontier
        .join(e.withColumnRenamed("src", "node"), Seq("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(depth.toLong))
        .localCheckpoint()
      visited = visited.union(frontier).localCheckpoint()
    }
    visited
  }

  /** Driver BFS over a small edge set streamed via `toLocalIterator`
    * — identical (node, dist) contract to the distributed rounds. */
  private def localBfs(e: DataFrame, s0: DataFrame, maxDepth: Int): DataFrame = {
    val spark = e.sparkSession
    val adj = new java.util.HashMap[Long, java.util.ArrayList[Long]]()
    val it = e.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      adj.computeIfAbsent(r.getLong(0), _ => new java.util.ArrayList[Long]())
        .add(r.getLong(1))
    }
    val dist = new java.util.HashMap[Long, Long]()
    var frontier = new java.util.ArrayList[Long]()
    val sit = s0.toLocalIterator()
    while (sit.hasNext) {
      val n = sit.next().getLong(0)
      if (!dist.containsKey(n)) { dist.put(n, 0L); frontier.add(n) }
    }
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = new java.util.ArrayList[Long]()
      val fit = frontier.iterator()
      while (fit.hasNext) {
        val ns = adj.get(fit.next())
        if (ns != null) {
          val nit = ns.iterator()
          while (nit.hasNext) {
            val d = nit.next()
            if (!dist.containsKey(d)) { dist.put(d, depth.toLong); next.add(d) }
          }
        }
      }
      frontier = next
    }
    val out = new Array[(Long, Long)](dist.size)
    val dit = dist.entrySet().iterator()
    var i = 0
    while (dit.hasNext) {
      val kv = dit.next(); out(i) = (kv.getKey, kv.getValue); i += 1
    }
    import spark.implicits._
    spark.createDataset(spark.sparkContext.parallelize(out.toIndexedSeq,
      math.max(1, out.length / 500000))).toDF("node", "dist")
  }

  /** Modularity of a node partition (Newman & Girvan 2004) in EXACT
    * cleared-rational form — the standard "is this community
    * assignment better than chance" score: Q = Σ_c (e_c/m −
    * (d_c/2m)²) over communities c, with e_c = intra-community
    * edges, d_c = total degree inside c, m = |E| undirected distinct
    * edges. Clearing by 4m² makes every per-community contribution an
    * exact integer: contrib_num = 4·m·e_c − d_c², and
    * Q = Σ contrib_num / (4m²) — rank communities, compare
    * assignments (LPA rounds, region priors, ER clusters) with zero
    * float drift.
    *
    * Scale shape: canonicalize-distinct the edge set once, one degree
    * aggregate, two broadcast-joins of the (node, community)
    * assignment onto edge endpoints (assignment rows ≤ nodes — NOT
    * broadcast: joined on the node key, skew-safe), then one hash
    * aggregate per community. The 1-row m scalar rides a broadcast
    * crossJoin (police-whitelisted class). Nodes absent from the
    * assignment form singleton communities of their own id (the LPA
    * initialization convention).
    *
    * Returns one row per community: `(community, n_nodes, e_in,
    * d_tot, m, contrib_num)` — Σ contrib_num / (4m²) is the
    * modularity; magnitudes stay in BIGINT for d_c, m < ~1.5·10⁹.
    */
  def modularityScore(edges: DataFrame, aCol: String, bCol: String,
                      assignment: DataFrame): DataFrame = {
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    val asg = assignment.select(
      col(assignment.columns.head).cast("long").as("node"),
      col(assignment.columns(1)).cast("long").as("community"))
    val nodes = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node"))).distinct()
      .join(asg, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("community"), col("node")).as("community"))
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val m = und.agg(count(lit(1)).as("m"))
    val labeled = und
      .join(nodes.select(col("node").as("u"), col("community").as("cu")), "u")
      .join(nodes.select(col("node").as("v"), col("community").as("cv")), "v")
    val eIn = labeled.filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("e_in"))
    val dTot = nodes.join(deg, Seq("node"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_tot"))
    dTot.join(eIn, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"))
      .crossJoin(broadcast(m)) // 1-row edge-count scalar
      // DECIMAL(38,0) like the sibling degreeAssortativity — raw BIGINT
      // would wrap silently near the documented bound (4·m·e_in at
      // ~10^9 edges exceeds 2^63). Under default (non-ANSI) Spark a
      // decimal→long overflow returns NULL silently, so the cast is
      // gated by an EXPLICIT range guard that raises — loud failure,
      // never a silently-dropped community (the trimmedMeanByGroup
      // guard convention).
      .withColumn("contrib_num", graft.functions.GraftFunctions.guardedLongCast(
        lit(4) * col("m").cast("decimal(38,0)") * col("e_in")
          - col("d_tot").cast("decimal(38,0)") * col("d_tot"),
        "modularityByCommunity: contrib_num exceeds BIGINT — keep DECIMAL(38,0)"))
  }

  /** Labeled multi-source BFS: exact hop distance from EACH landmark
    * separately — [[bfsDistances]] answers "how far from the NEAREST
    * flagged node"; this keeps the per-landmark distances apart, the
    * state a landmark-based closeness estimate needs (Potamias et al.
    * CIKM 2009: k well-spread landmarks approximate closeness
    * centrality at k·|V| state instead of the all-pairs |V|²).
    *
    * Frontier expansion keyed by (landmark, node): per hop one join
    * of the frontier against the edge table (shuffle keyed on the
    * node — landmark multiplicity rides inside each node's rows) and
    * one anti-join against the visited set. State and every shuffle
    * are bounded by k·|V|; rounds stop at `maxDepth` or frontier
    * exhaustion. Returns `(landmark, node, dist)` for every REACHED
    * pair (landmark, landmark, 0) included.
    */
  def landmarkDistances(edges: DataFrame, srcCol: String, dstCol: String,
                        landmarks: DataFrame, maxDepth: Int = 10): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("node"),
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint()
    val s0 = landmarks
      .select(col(landmarks.columns.head).cast("long").as("lm")).distinct()
      .select(col("lm"), col("lm").as("node"), lit(0L).as("dist"))
    var visited = s0.localCheckpoint()
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      frontier = frontier
        .join(e, Seq("node"))
        .select(col("lm"), col("dst").as("node")).distinct()
        .join(visited.select(col("lm"), col("node")), Seq("lm", "node"),
          "left_anti")
        .withColumn("dist", lit(depth.toLong))
        .localCheckpoint()
      visited = visited.union(frontier).localCheckpoint()
    }
    visited
  }

  /** Harmonic closeness FROM a landmark set (the [[landmarkDistances]]
    * readout): per node, `n_reached` landmarks and
    * `harmonic_micro = Σ_landmarks 10⁶ div d(lm, node)` over d ≥ 1 —
    * the harmonic form handles unreachable pairs by simply
    * contributing 0 (Boldi & Vigna 2014's argument for harmonic over
    * classic closeness), so the score is total on any graph. Exact
    * integers end to end; one hash aggregate over the (landmark,
    * node) distance table. Landmarks themselves score their distance
    * to OTHER landmarks (the self 0-distance row is excluded).
    */
  def harmonicFromLandmarks(edges: DataFrame, srcCol: String, dstCol: String,
                            landmarks: DataFrame,
                            maxDepth: Int = 10): DataFrame =
    landmarkDistances(edges, srcCol, dstCol, landmarks, maxDepth)
      .where(col("dist") >= 1)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000L div dist")).as("harmonic_micro"))

  /** HITS hubs & authorities (Kleinberg 1999) in exact fixed-point
    * arithmetic — [[pageRank]]'s bilateral sibling for directed
    * link/endorsement graphs. Each round:
    *   auth'(v) = Σ_{u→v} hub(u),  hub'(u) = Σ_{u→v} auth'(v),
    * then both vectors renormalize by their MAX (not the L2 norm — an
    * integer `div` by the max keeps every score an exact integer in
    * [0, scale] while preserving order, which is what the ranking
    * consumer needs; the classic float L2 normalization differs only
    * by a positive constant factor per round... until you need it
    * hash-certified). A fixed `iters` yields bit-identical scores on
    * any engine replaying the recurrence — q114's unrolled-oracle
    * pattern.
    *
    * Per round: two keyed shuffles (contribution sums on `dst`, then
    * `src`) + one max aggregate each — the standard distributed HITS
    * plan, nothing driver-side but the two scalar maxima.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
           scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // overflow contract: maxInDegree·scale² < 2^63 — at the default
    // scale 10⁶ that allows hubs of ~9·10⁶ in-links; drop scale for
    // hubbier graphs (order is preserved at any scale)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    if (e.isEmpty) return nodes.select(col("node"), lit(0L).as("hub"),
      lit(0L).as("auth"))
    var scores = nodes.select(col("node"), lit(scale).as("hub"),
      lit(scale).as("auth"))
    for (_ <- 1 to iters) {
      // each raw contribution table feeds TWO consumers (its max probe
      // and the renormalized vector) — materialize it once so the
      // e-join + sum subtree never re-executes (before: the hMax probe
      // and the round's scores checkpoint re-ran authRaw/hubRaw from
      // scratch, 5 e-joins per round instead of 2)
      val authRaw = e.join(scores.select(col("node").as("src"), col("hub")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("a_raw"))
        .localCheckpoint()
      val aMax = authRaw.agg(max(col("a_raw"))).head.getLong(0)
      val auth = nodes.join(authRaw, Seq("node"), "left")
        .select(col("node"),
          expr(s"coalesce(a_raw, 0L) * ${scale}L div ${aMax}L").as("auth"))
      val hubRaw = e.join(auth.select(col("node").as("dst"), col("auth")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("h_raw"))
        .localCheckpoint()
      val hMax = hubRaw.agg(max(col("h_raw"))).head.getLong(0)
      scores = nodes.join(hubRaw, Seq("node"), "left")
        .join(auth, Seq("node"))
        .select(col("node"),
          expr(s"coalesce(h_raw, 0L) * ${scale}L div ${hMax}L").as("hub"),
          col("auth"))
        .localCheckpoint()
    }
    scores
  }

  /** Synchronous label propagation (Raghavan et al. 2007) made
    * DETERMINISTIC: every node simultaneously adopts the most frequent
    * label among its neighbors, ties broken by the SMALLEST label —
    * so a fixed `rounds` yields one well-defined answer any engine
    * can replay (classic async LPA is order-dependent; this is the
    * hash-certifiable variant, at the usual cost of possible label
    * oscillation on bipartite structures — pick odd/even rounds or
    * read densities, as LPA users do). Labels start as node ids;
    * communities are the surviving label groups.
    *
    * Per round: one shuffle to attach labels to the symmetric neighbor
    * view, one (node, label) count aggregate, one min-struct argmax —
    * all hash aggregates on high-cardinality keys, materialized per
    * round under the iterative-family checkpoint invariant.
    */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val nbrs = und.select(col("u").as("node"), col("v").as("nbr"))
      .union(und.select(col("v").as("node"), col("u").as("nbr")))
      .localCheckpoint()
    var labels = nbrs.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      labels = nbrs
        .join(labels.select(col("node").as("nbr"), col("label")), Seq("nbr"))
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Per-NODE triangle counts + local clustering numerators — the
    * node-level readout of [[triangleStats]] (spam/bot detection,
    * community cores: a high-degree node with few triangles is a
    * broadcaster, not a member). Same degree-ordered orientation and
    * wedge-close join; each closed triangle then credits its three
    * corners via one explode + hash aggregate, so the plan adds ONE
    * cheap stage to the census. Returns per node: `deg`,
    * `n_triangles`, and the exact local-clustering rational
    * `2·n_triangles / (deg·(deg−1))` as `lcc_num` = 2·t and
    * `lcc_den` = deg·(deg−1) (un-divided, hash-certifiable; nodes of
    * degree 1 get lcc_den = 0 — callers treat 0/0 as undefined).
    */
  def nodeTriangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // edge-iterator closure over the shared [[orientedAdjacency]]
    // prologue: each triangle surfaces exactly once at its lowest
    // oriented edge, as the exploded common out-neighbors of the
    // edge's two ends — no wedge set ever materializes, every exchange
    // stays m-sized, and the explode's output is triangle-count-sized
    // (the per-corner credit rows)
    val (_, deg, o, adj) = orientedAdjacency(edges, aCol, bCol)
    val closed = o
      .join(adj.select(col("src"), col("nbrs").as("nu")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), Seq("dst"))
      .select(col("src"), col("dst"),
        explode(array_intersect(col("nu"), col("nv"))).as("w"))
    val perNode = closed
      .select(explode(array(col("src"), col("dst"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    // eager materialization of the NODE-sized readout (n ≪ m rows),
    // then release the m-sized adjacency cache — the triangleStats
    // release discipline
    val out = deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        (lit(2L) * coalesce(col("n_triangles"), lit(0L))).as("lcc_num"),
        (col("deg") * (col("deg") - 1)).as("lcc_den"))
      .localCheckpoint()
    adj.unpersist(blocking = false)
    out
  }

  /** DOULION sampled triangle census (Tsourakakis et al., KDD'09):
    * keep each undirected edge with probability p = pNum/pDen, count
    * triangles exactly on the sampled subgraph via [[triangleStats]],
    * and scale — E[t̂] = t for t̂ = t_sampled·(pDen/pNum)³, with
    * variance that vanishes as the graph grows (the KDD'09 bound).
    * This is the 100 TB-scale path beside the exact census: sampling
    * at p cuts the wedge join's input by p and its output by ~p².
    *
    * The coin is DETERMINISTIC — an edge survives iff the integer
    * drawn from md5("tri:<salt>:u:v")'s 12-hex prefix (the q47/q75/
    * q132 no-RNG convention, canonical (min, max) orientation) lands
    * below pNum mod pDen — so reruns, retried tasks, AND an
    * independent engine replay the SAME subgraph: the sampled counts
    * hash-certify exactly, and the estimator is the exact integer
    * `n_triangles_sampled · pDen³ div pNum³`.
    *
    * Returns one row: the sampled-subgraph [[triangleStats]] columns
    * plus `est_triangles`.
    */
  def triangleStatsSampled(edges: DataFrame, aCol: String, bCol: String,
                           pNum: Int, pDen: Int, salt: String = "42"): DataFrame = {
    require(pNum > 0 && pNum <= pDen, s"need 0 < p <= 1, got $pNum/$pDen")
    val coin = conv(substring(md5(concat_ws(":", lit("tri"), lit(salt),
      col("u").cast("string"), col("v").cast("string"))), 1, 12), 16, 10)
      .cast("long") % pDen.toLong
    val sampled = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      // distinct BEFORE the coin: the md5 draw is per undirected edge,
      // so evaluating it on raw multi-edges (12.6M rows on the
      // co-purchase graph vs 1.2M distinct) wastes ~90% of the hashing;
      // filter-after-distinct samples the identical subgraph
      .distinct()
      .filter(coin < pNum.toLong)
    triangleStats(sampled, "u", "v")
      .withColumn("est_triangles",
        expr(s"n_triangles * ${pDen.toLong * pDen * pDen}L div ${pNum.toLong * pNum * pNum}L"))
  }

  /** k-core: the maximal subgraph in which every node has degree ≥ k,
    * by iterative peeling (delete all nodes of degree < k; deleting
    * them lowers neighbors' degrees, so repeat to the fixpoint — the
    * classic Matula-Beck reduction, distributed). Each round is one
    * degree aggregate + two anti-joins over the shrinking edge set,
    * materialized per round under [[Clusters]]' one-round-per-
    * checkpoint invariant; the surviving edge count (already computed
    * for the degree aggregate's input) doubles as the convergence
    * test, so a round costs exactly one job. Peeling depth bounds the
    * rounds (≤ degeneracy ordering length; tiny for power-law graphs
    * — the hub survives, the fringe peels in O(1) waves).
    *
    * Anti-join sides are NOT broadcast: in early rounds most of the
    * graph can peel at once, so the removed-node set is unbounded —
    * both legs shuffle on the node key, skew-safe at any graph shape.
    *
    * Returns the surviving node set `(node, core_deg)` with each
    * node's degree INSIDE the core (≥ k by construction; the spec
    * pins exactness against a driver-side peel). Empty iff no k-core.
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            maxIter: Int = 50, localLimit: Long = 1L << 22): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var e = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    // peeling waves are LATENCY-bound like the CC star rounds: a small
    // graph peels in the driver in one job ([[Clusters
    // .connectedComponents]] fast-path contract; specs force both
    // paths via localLimit = 0)
    if (e.count() <= localLimit) return localKCore(e, k)
    var it = 0
    var done = false
    var deg: DataFrame = null
    while (it < maxIter && !done) {
      // the round's degree table has FOUR consumers (the isEmpty peel
      // probe, both anti-join legs, and — on the converged round — the
      // final >= k readout): materialize it once per round instead of
      // re-running the union+aggregate per consumer
      deg = e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
        .localCheckpoint()
      val bad = deg.filter(col("core_deg") < k).select(col("node"))
      if (bad.isEmpty) done = true
      else {
        e = e
          .join(bad.withColumnRenamed("node", "u"), Seq("u"), "left_anti")
          .join(bad.withColumnRenamed("node", "v"), Seq("v"), "left_anti")
          .localCheckpoint()
        it += 1
      }
    }
    // maxIter exhaustion leaves `deg` computed BEFORE the last peel:
    // stale counts, and just-peeled nodes would leak through the >= k
    // filter. Recompute from the final edge set so the returned set is
    // always a subgraph with every core_deg true — at worst a valid
    // PARTIAL peel (a superset of the k-core), never an invalid one.
    if (!done) {
      deg = e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
    }
    deg.filter(col("core_deg") >= k)
  }

  /** k-truss: the maximal subgraph whose every edge closes at least
    * k−2 triangles WITHIN the subgraph (Cohen 2008) — the edge-level
    * sharpening of [[kCore]] (a k-truss is always inside the
    * (k−1)-core, but demands cohesion per EDGE, so it isolates
    * genuinely dense communities where the core keeps hub-threaded
    * fluff). Peeling fixpoint, like the core: each round recounts
    * per-edge triangle support over the SURVIVING edges and drops
    * edges below k−2; deletion can only lower neighbors' support, so
    * the fixpoint is order-independent and exact.
    *
    * Per round the support count is the [[triangleStats]] oriented
    * enumeration (degree-ordered apexes, O(√m) wedge fan-out,
    * hub-proof): each closed wedge (apex, x, y) charges its THREE
    * undirected edges, one groupBy sums the charges. Rounds
    * materialize via localCheckpoint ([[Clusters]]' one-round
    * invariant); the surviving-edge count doubles as the convergence
    * test. Peeling depth ≤ the truss number of the graph — small for
    * the power-law graphs that matter.
    *
    * Returns the surviving undirected edges `(u, v, support)` with
    * support counted INSIDE the truss (≥ k−2 by construction, ALWAYS
    * recomputed from the final edge set — the kCore maxIter lesson
    * baked in from the start).
    */
  def kTruss(edges: DataFrame, aCol: String, bCol: String, k: Int,
             maxIter: Int = 50): DataFrame = {
    require(k >= 3, "k must be >= 3 (k = 2 is just the edge set)")
    var e = edges
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    val need = (k - 2).toLong
    var it = 0
    var done = false
    var supp: DataFrame = null
    while (it < maxIter && !done) {
      // the round's support table has TWO consumers (the isEmpty peel
      // probe and the anti-join's bad set) and — on the converged
      // round — doubles as the final readout: materialize ONE wedge
      // enumeration per round (before: the anti-join action re-ran the
      // whole edgeSupport subtree, and convergence paid a third full
      // enumeration for `fin`)
      supp = edgeSupport(e).localCheckpoint()
      val bad = e.join(supp, Seq("u", "v"), "left")
        .filter(coalesce(col("support"), lit(0L)) < need)
        .select(col("u"), col("v"))
      if (bad.isEmpty) done = true
      else {
        e = e.join(bad, Seq("u", "v"), "left_anti").localCheckpoint()
        it += 1
      }
    }
    // always emit the FINAL edge set's support — after a clean
    // fixpoint this is the converged round's (already-materialized)
    // count (≥ k−2, identical by the fixpoint argument: no edge was
    // bad, so no edge peeled after it was computed); on maxIter
    // exhaustion the peel DID change e, so recount over the final
    // edge set — still a true count over a valid partial peel
    val fin = if (done && supp != null) supp else edgeSupport(e)
    val out = e.join(fin, Seq("u", "v"), "left")
      .select(col("u"), col("v"), coalesce(col("support"), lit(0L)).as("support"))
    if (done) out.filter(col("support") >= need) else out
  }

  /** Per-edge triangle support over an undirected deduplicated
    * (u < v) edge table: the oriented wedge-closure enumeration with
    * each triangle charging its three edges. Edges in no triangle are
    * absent (count 0 downstream via left join). */
  private def edgeSupport(und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val fwd = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val o = withDeg.select(
        when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"),
        when(fwd, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint()
    val e1 = o.select(col("src"), col("dst").as("x"), col("ddst").as("dx"))
    val e2 = o.select(col("src"), col("dst").as("y"), col("ddst").as("dy"))
    val tri = e1.join(e2, Seq("src"))
      .filter(struct(col("dx"), col("x")) < struct(col("dy"), col("y")))
      .join(o.select(col("src").as("x"), col("dst").as("y")), Seq("x", "y"))
      .select(col("src").as("a"), col("x"), col("y"))
    // each triangle charges its three undirected edges — via ONE
    // explode, not a 3-way union of projections: union children are
    // planned independently, so the union form re-executed the whole
    // wedge-closure join three times per count (only its exchanges
    // were reused); the explode charges all three edges in one pass
    val charges = tri.select(explode(array(
        struct(least(col("a"), col("x")).as("u"), greatest(col("a"), col("x")).as("v")),
        struct(least(col("a"), col("y")).as("u"), greatest(col("a"), col("y")).as("v")),
        struct(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))))
        .as("edge"))
      .select(col("edge.u").as("u"), col("edge.v").as("v"))
    charges.groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
  }

  /** Driver peel over a small deduplicated edge set — identical
    * (node, core_deg) contract to the distributed waves. */
  private def localKCore(e: DataFrame, k: Int): DataFrame = {
    val spark = e.sparkSession
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[Long, mutable.HashSet[Long]]
    val it = e.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val (u, v) = (r.getLong(0), r.getLong(1))
      adj.getOrElseUpdate(u, mutable.HashSet.empty) += v
      adj.getOrElseUpdate(v, mutable.HashSet.empty) += u
    }
    val queue = mutable.Queue.empty[Long]
    adj.foreach { case (n, ns) => if (ns.size < k) queue += n }
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      adj.remove(n).foreach { ns =>
        ns.foreach { m =>
          adj.get(m).foreach { ms =>
            ms -= n
            if (ms.size == k - 1) queue += m // just dropped below k
          }
        }
      }
    }
    val out = adj.iterator.map { case (n, ns) => (n, ns.size.toLong) }.toArray
    import spark.implicits._
    spark.createDataset(spark.sparkContext.parallelize(out.toIndexedSeq,
      math.max(1, out.length / 500000))).toDF("node", "core_deg")
  }

  /** Degree profile of a directed edge table: one row per node with
    * exact out/in degrees (distinct-edge semantics, matching
    * [[pageRank]]'s view of the graph). Two hash aggregates and an
    * outer join on the node key — no window, no sort.
    */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val outD = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val inD = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    outD.join(inD, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Degree assortativity ingredients (Newman 2002), EXACT-integer:
    * do high-degree nodes attach to high-degree nodes (r > 0, social
    * graphs) or to low-degree ones (r < 0, the internet/star shapes)?
    * Newman's r is the Pearson correlation of the degrees at the two
    * ends of an undirected edge, symmetrized over both orientations;
    * over the 2m directed stubs with end degrees (j, k):
    *   r = (2m·Σjk − (Σj)²/1) … cleared over the common denominator:
    *   r_num = 4m·Σ_e(du·dv) − (Σ_e(du+dv))²
    *   r_den = 2m·Σ_e(du²+dv²) − (Σ_e(du+dv))²
    * (sums over UNDIRECTED edges e — the orientation symmetry folds
    * into the constants). Shipped un-divided as exact BIGINTs
    * (DECIMAL(38,0) internally — loud overflow, not wrap), plus the
    * raw ingredient sums; r = r_num/r_den is one IEEE division at the
    * edge. r_den = 0 (all degrees equal) means r is undefined —
    * callers treat 0/0 as "perfectly regular graph".
    *
    * Scale shape: the [[triangleStats]] prologue — distinct undirected
    * edges, one degree aggregate, two hash joins to decorate ends —
    * then ONE 1-row fold. No window, no orientation explosion (the
    * both-directions sum is algebra, not a union).
    */
  def degreeAssortativity(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .agg(count(lit(1)).as("m"),
        coalesce(sum(col("du") + col("dv")), lit(0L)).cast("long").as("sum_deg"),
        coalesce(sum(dec(col("du")) * col("dv")), dec(lit(0L))).as("__sp"),
        coalesce(sum(dec(col("du")) * col("du") + dec(col("dv")) * col("dv")),
          dec(lit(0L))).as("__ss"))
      .select(col("m"), col("sum_deg"),
        col("__sp").cast("long").as("sum_prod"),
        col("__ss").cast("long").as("sum_sq"),
        (lit(4) * dec(col("m")) * col("__sp")
          - dec(col("sum_deg")) * col("sum_deg")).cast("long").as("r_num"),
        (lit(2) * dec(col("m")) * col("__ss")
          - dec(col("sum_deg")) * col("sum_deg")).cast("long").as("r_den"))
  }

  /** Weighted single/multi-source shortest paths over directed edges
    * with NON-NEGATIVE integer weights — [[bfsDistances]]' weighted
    * sibling (cost-of-reach queries: cheapest routing hops, weakest-
    * link trade distance, latency radius). Distributed Bellman-Ford
    * frontier relaxation: round r joins the CURRENT frontier (nodes
    * whose tentative distance improved last round) against the edge
    * table, takes the per-target MIN candidate, and keeps only strict
    * improvements over the settled table — both shuffles are sized by
    * the frontier fan-out, never all-pairs, and with non-negative
    * weights every improvement is monotone so the fixpoint is the
    * exact shortest-path metric. Rounds stop when no distance improves
    * (the improvement count doubles as the convergence probe) or at
    * `maxRounds`; convergence needs at most (longest shortest path's
    * hop count) rounds, so `maxRounds` exhaustion with a non-empty
    * frontier means the returned distances are still true UPPER bounds
    * but may not be final — callers size `maxRounds` ≥ the graph's hop
    * diameter, as with [[bfsDistances]]' depth cap.
    *
    * Negative weights are rejected loudly (a codegen'd `raise_error`
    * guard on the scan — Bellman-Ford would still converge but the
    * Dijkstra fast path and the monotone-frontier argument would not).
    * Parallel edges keep the MIN weight; self-loops are dropped.
    *
    * Rounds are LATENCY-bound like the BFS frontier waves, so a small
    * edge set takes a driver Dijkstra instead ([[Clusters
    * .connectedComponents]] fast-path contract; specs force both paths
    * via `localLimit = 0`).
    *
    * Returns `(node, dist)` for every REACHED node (sources at 0,
    * nearest source wins); unreached nodes are absent.
    */
  def ssspDistances(edges: DataFrame, srcCol: String, dstCol: String,
                    wCol: String, sources: DataFrame, maxRounds: Int = 30,
                    localLimit: Long = 1L << 22): DataFrame = {
    val guarded = when(col(wCol).cast("long") < 0L,
        raise_error(lit("ssspDistances: negative edge weight")).cast("long"))
      .otherwise(col(wCol).cast("long"))
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), guarded.as("w"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .localCheckpoint()
    val s0 = sources.select(col(sources.columns.head).cast("long").as("node"))
      .distinct()
    if (e.count() <= localLimit) return localSssp(e, s0, maxRounds)
    var best = s0.withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = best
    var round = 0
    while (round < maxRounds && !frontier.isEmpty) {
      round += 1
      val cand = frontier
        .join(e.withColumnRenamed("src", "node"), Seq("node"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("dist") + col("w")).as("cand"))
      frontier = cand
        .join(best, Seq("node"), "left")
        .filter(col("dist").isNull || col("cand") < col("dist"))
        .select(col("node"), col("cand").as("dist"))
        .localCheckpoint()
      best = best.join(frontier.select(col("node")), Seq("node"), "left_anti")
        .union(frontier)
        .localCheckpoint()
    }
    best
  }

  /** Driver Dijkstra over a small (src, dst, w) edge set streamed via
    * `toLocalIterator` — identical (node, dist) contract to the
    * distributed relaxation rounds (`maxRounds` is ignored: Dijkstra
    * settles exactly, which the rounds reach whenever they converge).
    */
  private def localSssp(e: DataFrame, s0: DataFrame, maxRounds: Int): DataFrame = {
    val spark = e.sparkSession
    val adj = new java.util.HashMap[Long, java.util.ArrayList[(Long, Long)]]()
    val it = e.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      adj.computeIfAbsent(r.getLong(0), _ => new java.util.ArrayList[(Long, Long)]())
        .add((r.getLong(1), r.getLong(2)))
    }
    val dist = new java.util.HashMap[Long, Long]()
    val pq = new java.util.PriorityQueue[(Long, Long)](
      (a: (Long, Long), b: (Long, Long)) => java.lang.Long.compare(a._1, b._1))
    val sit = s0.toLocalIterator()
    while (sit.hasNext) pq.add((0L, sit.next().getLong(0)))
    while (!pq.isEmpty) {
      val (d, n) = pq.poll()
      if (!dist.containsKey(n)) {
        dist.put(n, d)
        val ns = adj.get(n)
        if (ns != null) {
          val nit = ns.iterator()
          while (nit.hasNext) {
            val (m, w) = nit.next()
            if (!dist.containsKey(m)) pq.add((d + w, m))
          }
        }
      }
    }
    val out = new Array[(Long, Long)](dist.size)
    val dit = dist.entrySet().iterator()
    var i = 0
    while (dit.hasNext) {
      val kv = dit.next(); out(i) = (kv.getKey, kv.getValue); i += 1
    }
    import spark.implicits._
    spark.createDataset(spark.sparkContext.parallelize(out.toIndexedSeq,
      math.max(1, out.length / 500000))).toDF("node", "dist")
  }
}
