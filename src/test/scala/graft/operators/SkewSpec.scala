package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("salted join matches plain join on skewed keys") {
    // 90% of fact rows share one hot key
    val fact = ((1 to 900).map(i => (1L, i.toDouble)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toDouble))).toDF("k", "v")
    val dim = (1 to 10).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8).groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // salted fact spreads the hot key over multiple (key, salt) groups
    val saltSpread = fact.withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(fact.columns.map(org.apache.spark.sql.functions.col).toSeq: _*),
          org.apache.spark.sql.functions.lit(8)))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(saltSpread > 1)
  }

  test("salted sum matches plain aggregation") {
    val df = ((1 to 500).map(_ => ("hot", 1.0)) ++ Seq(("cold", 2.0), ("cold", 3.0)))
      .toDF("k", "v")
    val plain = df.groupBy("k").sum("v").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, "k", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("hotColdLookupJoin: parity with a plain join; hot keys take the broadcast leg") {
    import org.apache.spark.sql.functions._
    // one mega-key (5000 rows) + a cold tail
    val fact = ((1 to 5000).map(i => (1L, i)) ++
      (1 to 200).map(i => (2L + i % 9, i))).toDF("k", "payload")
    val lookup = fact.groupBy("k").agg(min("payload").as("m"), count(lit(1)).as("__c"))
    val got = Skew.hotColdLookupJoin(fact, lookup, "k", "__c", hotThreshold = 1000)
    val plain = fact.join(lookup.drop("__c"), "k")
    assert(got.count() == plain.count())
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
    // plan shape: the hot leg is a broadcast join — hub rows never
    // enter a keyed exchange
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected a broadcast hot leg:\n$p")
  }
}
