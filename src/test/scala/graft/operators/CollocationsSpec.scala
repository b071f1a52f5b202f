package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CollocationsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def run(texts: Seq[String], k: Int, minPair: Long) =
    Collocations.pmiTopK(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", k, minPair)
      .collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n_pair"), r.getAs[Long]("n_w1"),
        r.getAs[Long]("n_w2"), r.getAs[Long]("pmi_scaled")))

  test("pmiTopK: exact integer skeleton on a hand-checked corpus") {
    // 'new york' always together (high PMI); 'the' everywhere (low PMI)
    val texts = Seq.fill(3)("the new york trip") :+ "the the trip"
    // tokens: the=5, new=3, york=3, trip=4; N=15
    // pairs: (new,york)=3, (the,new)=3, (york,trip)=3, (the,the)=1, (the,trip)=1
    val got = run(texts, k = 10, minPair = 2L)
    val asMap = got.map(r => (r._1, r._2) -> r).toMap
    assert(asMap(("new", "york")) == ("new", "york", 3L, 3L, 3L,
      3L * 15L * 1000000L / (3L * 3L)))
    assert(asMap(("the", "new")) == ("the", "new", 3L, 5L, 3L,
      3L * 15L * 1000000L / (5L * 3L)))
    // support filter: the single-occurrence pairs are gone
    assert(!asMap.contains(("the", "the")) && !asMap.contains(("the", "trip")))
    // ranking: (new,york) 5M, (york,trip) 3.75M, (the,new) 3M
    assert(got.head._1 == "new" && got.head._2 == "york")
  }

  test("pmiTopK: deterministic tie order (pmi desc, w1, w2) and k cap") {
    // two pairs with identical counts everywhere -> tied pmi; w1 breaks it
    val texts = Seq.fill(4)("aa bb") ++ Seq.fill(4)("cc dd")
    val got = run(texts, k = 1, minPair = 2L)
    assert(got.length == 1)
    assert((got.head._1, got.head._2) == ("aa", "bb"))
  }

  test("pmiTopK: single-token docs contribute unigrams but no pairs") {
    val texts = Seq.fill(5)("solo") ++ Seq.fill(5)("x y")
    val got = run(texts, k = 10, minPair = 2L)
    assert(got.map(r => (r._1, r._2)).toSet == Set(("x", "y")))
    // N counts the solo tokens too: 5 + 10 = 15 -> 5*15e6 div 25
    assert(got.head._6 == 3000000L)
  }
}
