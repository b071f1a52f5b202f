package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components correctness vs a driver-side union-find oracle,
  * including the shapes that break naive label propagation (long chains)
  * and the survivorship contract of dedupClusters.
  */
class ClustersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical root = min id reachable ⇒ path-compress to the min
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // union by min above keeps roots minimal already; find() settles chains
    ids.map(i => i -> find(i)).toMap
  }

  private def sparkComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clusters.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, clique, singleton-pair mix matches union-find") {
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val clique = for (i <- 100L to 105L; j <- (i + 1) to 105L) yield (i, j)
    val lone = Seq((200L, 201L))
    val edges = scala.util.Random.shuffle(chain ++ clique ++ lone)
    assert(sparkComponents(edges) == unionFind(0, edges))
  }

  test("random graphs at several densities match union-find (seeded)") {
    for (seed <- 1 to 3; density <- Seq(0.5, 1.5)) {
      val rnd = new scala.util.Random(seed)
      val n = 120
      val m = (n * density).toInt
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(n, edges)
      val got = sparkComponents(edges)
      assert(got == expected, s"seed=$seed density=$density")
    }
  }

  test("empty pair set: every document is its own kept singleton") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = Clusters.dedupClusters(docs, "doc_id", noPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, 1L, true), (2L, 2L, true), (3L, 3L, true)))
  }

  test("a 300-node chain converges within the iteration bound (breaks label propagation)") {
    // plain min-label propagation needs ~300 rounds here; the
    // alternating algorithm's O(log n) contraction must finish well
    // inside maxIter = 25
    val chain = (0L until 300L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = sparkComponents(scala.util.Random.shuffle(chain))
    assert(got.size == 300 && got.values.forall(_ == 0L))
  }

  test("reversed and duplicated edges don't change components") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (7L, 5L))
    assert(sparkComponents(edges) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 7L -> 5L))
  }

  test("dedupClusters: transitive groups collapse to one survivor; singletons kept") {
    import spark.implicits._
    // A~B, B~C (A~C never emitted) + isolated doc 9
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Clusters.dedupClusters(docs, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (9L, 9L, true)))
  }
}
