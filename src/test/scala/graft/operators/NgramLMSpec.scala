package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bigram LM vs a driver-side reference: count tables, likelihood
  * masses, and the transcendental perplexity (which the DuckDB oracle
  * can't certify — q72 covers the mass form).
  */
class NgramLMSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the rat"),
    (3L, "a dog sat on a log"),
    (4L, "single"),          // < 2 tokens: no grams, absent from scores
    (5L, "the the the"))     // repeated-token degenerate case

  private def refTokens(t: String) = t.trim.split("\\s+").toSeq

  private def refModel = {
    val grams = corpus.flatMap { case (_, t) =>
      val w = refTokens(t); if (w.length < 2) Nil else w.sliding(2).toSeq
    }
    val c2 = grams.groupBy(identity).map { case (g, gs) => g -> gs.size.toLong }
    val c1 = grams.groupBy(_.head).map { case (w, gs) => w -> gs.size.toLong }
    val v = corpus.flatMap(c => refTokens(c._2)).distinct.size.toLong
    (c2, c1, v)
  }

  test("fit: count tables and vocab size match the reference") {
    val docs = corpus.toDF("doc_id", "text")
    val model = NgramLM.fit(docs, "doc_id", "text")
    val (c2, c1, v) = refModel
    assert(model.vocabSize == v)
    assert(model.bigrams.count() == c2.size)
    assert(model.prefixes.count() == c1.size)
    // spot totals: sum of bigram counts == total gram occurrences
    assert(model.bigrams.agg(org.apache.spark.sql.functions.sum("c2"))
      .head().getLong(0) == c2.values.sum)
  }

  test("likelihoodMass: masses and single-division score match the reference") {
    val docs = corpus.toDF("doc_id", "text")
    val model = NgramLM.fit(docs, "doc_id", "text")
    val (c2, c1, v) = refModel
    val got = NgramLM.likelihoodMass(docs, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("hit_mass"),
          r.getAs[Long]("prefix_mass"), r.getAs[Double]("score"))).toMap
    assert(!got.contains(4L), "a one-token doc has no grams")
    corpus.filter(c => refTokens(c._2).length >= 2).foreach { case (id, t) =>
      val grams = refTokens(t).sliding(2).toSeq
      val hit = grams.map(g => c2(g) + 1).sum
      val pre = grams.map(g => c1(g.head) + v).sum
      assert(got(id) == ((grams.size.toLong, hit, pre, hit.toDouble / pre)),
        s"doc $id")
    }
  }

  test("perplexity: matches the driver-side add-one bigram computation") {
    val docs = corpus.toDF("doc_id", "text")
    val model = NgramLM.fit(docs, "doc_id", "text")
    val (c2, c1, v) = refModel
    val got = NgramLM.perplexity(docs, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("perplexity")).toMap
    corpus.filter(c => refTokens(c._2).length >= 2).foreach { case (id, t) =>
      val nlls = refTokens(t).sliding(2).toSeq.map { g =>
        -math.log((c2(g) + 1).toDouble / (c1(g.head) + v)) / math.log(2)
      }
      val want = math.pow(2, nlls.sum / nlls.size)
      assert(math.abs(got(id) - want) < 1e-9, s"doc $id: ${got(id)} vs $want")
    }
    // the degenerate doc "the the the": both grams are ("the","the"),
    // seen twice in fit → well-defined finite perplexity
    assert(got(5L) > 1.0 && java.lang.Double.isFinite(got(5L)))
  }

  test("merge: fit(A ∪ B) count tables equal merge(fit(A), fit(B))") {
    val a = corpus.take(2).toDF("doc_id", "text")
    val b = corpus.drop(2).toDF("doc_id", "text")
    val whole = NgramLM.fit(corpus.toDF("doc_id", "text"), "doc_id", "text")
    val pieces = NgramLM.merge(
      NgramLM.fit(a, "doc_id", "text"), NgramLM.fit(b, "doc_id", "text"))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(pieces.bigrams) == m(whole.bigrams))
    assert(m(pieces.prefixes) == m(whole.prefixes))
    // vocabSize sums per-batch vocab (documented over-count on
    // overlap): equality only when batches share no tokens — here
    // they DO share ("the", "sat", "on"), so merged > whole
    assert(pieces.vocabSize > whole.vocabSize)
    // the vocab-table companion restores the exact V
    assert(NgramLM.exactVocabSize(pieces) == whole.vocabSize)
  }

  test("stored model: store/load round-trips scores; stored side joins without a shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val tbl = s"lm${System.nanoTime()}"
    try {
      val docs = corpus.toDF("doc_id", "text")
      val model = NgramLM.fit(docs, "doc_id", "text")
      NgramLM.store(model, tbl, buckets = 4)
      val stored = NgramLM.load(spark, tbl)
      assert(stored.vocabSize == model.vocabSize)
      // scoring through the stored model reproduces the live scores
      def scores(m: NgramLM.Model) =
        NgramLM.likelihoodMass(docs, "doc_id", "text", m).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      assert(scores(stored) == scores(model))
      // plan shape at the 100 TB setting (no broadcast): the stored
      // bigram table must ride its bucketing into the join — no
      // exchange whose subtree scans it
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val j = NgramLM.likelihoodMass(docs, "doc_id", "text", stored)
        j.collect()
        val plan = j.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        def scansStored(p: SparkPlan): Boolean =
          p.collectLeaves().exists(l => l.toString.contains(s"${tbl}_bigrams") ||
            l.toString.contains(s"${tbl}_prefixes"))
        val shufflesOverStored = plan.collect {
          case s: ShuffleExchangeExec if scansStored(s) => s
        }
        assert(plan.toString.contains(s"${tbl}_bigrams"), "stored scan present")
        assert(shufflesOverStored.isEmpty,
          s"stored count tables must join through their bucketing, plan:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      // appendToStored: day-2 batch accretes; counts equal whole-corpus
      // fit INCLUDING vocabSize — day2 OVERLAPS day1's tokens ("the",
      // "cat", "sat", "a"), so the anti-join must count only the
      // genuinely new ones ("again", "new", "dog")
      val day2 = Seq((7L, "the cat sat again"), (8L, "a new dog")).toDF("doc_id", "text")
      NgramLM.appendToStored(spark, tbl, day2, "doc_id", "text", buckets = 4)
      val whole = NgramLM.fit(docs.union(day2), "doc_id", "text")
      def m(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val after = NgramLM.load(spark, tbl)
      assert(m(after.bigrams) == m(whole.bigrams))
      assert(m(after.prefixes) == m(whole.prefixes))
      assert(after.vocabSize == whole.vocabSize,
        "append ≡ refit must extend to the smoothing denominator V")
      // a second, FULLY-overlapping append: vocab must not move at all
      val day3 = Seq((9L, "the cat sat")).toDF("doc_id", "text")
      NgramLM.appendToStored(spark, tbl, day3, "doc_id", "text", buckets = 4)
      assert(NgramLM.load(spark, tbl).vocabSize == whole.vocabSize,
        "an all-seen batch must add zero vocab")
      // and scoring through the accreted store matches a whole refit
      val whole3 = NgramLM.fit(docs.union(day2).union(day3), "doc_id", "text")
      assert(scores(NgramLM.load(spark, tbl)) == scores(whole3))
    } finally Seq("_bigrams", "_prefixes", "_vocab", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
  }

  test("appendToStored crash discipline: every crash step replays to the exact refit model; tags make retries no-ops") {
    val docs = corpus.toDF("doc_id", "text")
    val day2 = Seq((7L, "the cat sat again"), (8L, "a new dog")).toDF("doc_id", "text")
    val whole = NgramLM.fit(docs.union(day2), "doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (wantBig, wantPre) = (m(whole.bigrams), m(whole.prefixes))
    // steps: 1 = stages written pre-marker (roll BACK, retry re-appends),
    // 2 = marker written pre-swap (roll FORWARD, retry no-ops),
    // 3 = mid-swap after the first live drop (roll FORWARD)
    for (step <- 1 to 3) {
      val tbl = s"lmcr${step}_${System.nanoTime()}"
      try {
        NgramLM.store(NgramLM.fit(docs, "doc_id", "text"), tbl, buckets = 4)
        intercept[IllegalStateException] {
          NgramLM.appendToStoredImpl(spark, tbl, day2, "doc_id", "text",
            buckets = 4, batchTag = Some("day2"), crashAfterStep = step)
        }
        // the RETRY — recoverStored runs on entry and classifies the
        // crash by the commit marker; the tag prevents double-counting
        val after = NgramLM.appendToStored(spark, tbl, day2, "doc_id", "text",
          buckets = 4, batchTag = Some("day2"))
        assert(m(after.bigrams) == wantBig, s"step $step: bigrams")
        assert(m(after.prefixes) == wantPre, s"step $step: prefixes")
        assert(after.vocabSize == whole.vocabSize, s"step $step: vocab size")
        // a SECOND tagged retry of the committed append: pure no-op
        val again = NgramLM.appendToStored(spark, tbl, day2, "doc_id", "text",
          buckets = 4, batchTag = Some("day2"))
        assert(m(again.bigrams) == wantBig, s"step $step: replayed tag must not double-count")
        // no stage or marker residue survives
        Seq("__stage_bigrams", "__stage_prefixes", "__stage_vocab",
          "__stage_meta", "__stage_tags", "__commit").foreach(s =>
          assert(!spark.catalog.tableExists(s"$tbl$s"), s"step $step: residue $s"))
      } finally Seq("_bigrams", "_prefixes", "_vocab", "_meta", "_tags",
        "__stage_bigrams", "__stage_prefixes", "__stage_vocab",
        "__stage_meta", "__stage_tags", "__commit").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
    }
  }

  test("committed-tag SET: a replay of ANY older committed tag no-ops, and a legacy meta-only tag still guards") {
    val docs = corpus.toDF("doc_id", "text")
    val day2 = Seq((7L, "the cat sat again"), (8L, "a new dog")).toDF("doc_id", "text")
    val day3 = Seq((9L, "entirely novel words here")).toDF("doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = m(NgramLM.fit(docs.union(day2).union(day3), "doc_id", "text").bigrams)
    val tbl = s"lmtags_${System.nanoTime()}"
    try {
      NgramLM.store(NgramLM.fit(docs, "doc_id", "text"), tbl, buckets = 4)
      NgramLM.appendToStored(spark, tbl, day2, "doc_id", "text",
        buckets = 4, batchTag = Some("day2"))
      NgramLM.appendToStored(spark, tbl, day3, "doc_id", "text",
        buckets = 4, batchTag = Some("day3"))
      assert(m(NgramLM.load(spark, tbl).bigrams) == want)
      // the r12 hole: replaying the OLDER committed tag after a newer
      // one landed silently double-counted every gram (only the latest
      // tag was kept); the committed-tag table makes it a no-op
      val replayOld = NgramLM.appendToStored(spark, tbl, day2, "doc_id", "text",
        buckets = 4, batchTag = Some("day2"))
      assert(m(replayOld.bigrams) == want,
        "an out-of-order replay of an older committed tag must no-op")
      // legacy codec: a store whose last tag lives only in the meta row
      // (pre-tags-table shape) still refuses that tag's replay
      spark.sql(s"DROP TABLE ${tbl}_tags")
      val replayLegacy = NgramLM.appendToStored(spark, tbl, day3, "doc_id", "text",
        buckets = 4, batchTag = Some("day3"))
      assert(m(replayLegacy.bigrams) == want,
        "the meta row's latest tag must still guard a pre-upgrade store")
    } finally Seq("_bigrams", "_prefixes", "_vocab", "_meta", "_tags",
      "__stage_bigrams", "__stage_prefixes", "__stage_vocab",
      "__stage_meta", "__stage_tags", "__commit").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
  }

  test("tag retention bounds the committed-tag set: retained tags still no-op, aged-out tags fall outside the replay horizon") {
    val docs = corpus.toDF("doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batches = (1 to 5).map(i =>
      i -> Seq((100L + i, s"retention batch number$i words")).toDF("doc_id", "text"))
    val tbl = s"lmret_${System.nanoTime()}"
    try {
      NgramLM.store(NgramLM.fit(docs, "doc_id", "text"), tbl, buckets = 4)
      batches.foreach { case (i, b) =>
        NgramLM.appendToStored(spark, tbl, b, "doc_id", "text",
          buckets = 4, batchTag = Some(s"t$i"), tagRetention = 3)
      }
      // only the 3 most-recent tags survive (bounded state, the O(n²)
      // rewrite fix) — and the table carries their commit order
      val kept = spark.table(s"${tbl}_tags").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(kept == Map("t3" -> 2L, "t4" -> 3L, "t5" -> 4L),
        s"retention must keep exactly the most-recent 3: $kept")
      val want = m(NgramLM.load(spark, tbl).bigrams)
      // a replay of a RETAINED tag no-ops exactly as before
      val replay = NgramLM.appendToStored(spark, tbl, batches(3)._2,
        "doc_id", "text", buckets = 4, batchTag = Some("t4"), tagRetention = 3)
      assert(m(replay.bigrams) == want,
        "a retained tag's replay must still no-op")
      // a tag aged OUT of the horizon is no longer recognized: the
      // documented contract is retention >= the caller's replay
      // horizon — the double-count is the expected breach behavior
      NgramLM.appendToStored(spark, tbl, batches(1)._2,
        "doc_id", "text", buckets = 4, batchTag = Some("t1"), tagRetention = 3)
      assert(m(NgramLM.load(spark, tbl).bigrams) != want,
        "an aged-out tag re-appends (outside the horizon by contract)")
      // legacy tags table (no seq column): retention treats its rows as
      // tied-oldest and a retained replay still guards
      val legacyTbl = s"lmretleg_${System.nanoTime()}"
      try {
        NgramLM.store(NgramLM.fit(docs, "doc_id", "text"), legacyTbl, buckets = 4)
        NgramLM.appendToStored(spark, legacyTbl, batches(1)._2, "doc_id", "text",
          buckets = 4, batchTag = Some("old1"))
        // strip seq to recreate the pre-r14 shape
        val legacyRows = spark.table(s"${legacyTbl}_tags").select("tag").localCheckpoint()
        legacyRows.write.mode("overwrite").saveAsTable(s"${legacyTbl}_tags")
        val before = m(NgramLM.load(spark, legacyTbl).bigrams)
        val lr = NgramLM.appendToStored(spark, legacyTbl, batches(1)._2,
          "doc_id", "text", buckets = 4, batchTag = Some("old1"), tagRetention = 3)
        assert(m(lr.bigrams) == before,
          "a legacy (seq-less) tag must still no-op its replay")
      } finally Seq("_bigrams", "_prefixes", "_vocab", "_meta", "_tags",
        "__stage_bigrams", "__stage_prefixes", "__stage_vocab",
        "__stage_meta", "__stage_tags", "__commit").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $legacyTbl$s"))
    } finally Seq("_bigrams", "_prefixes", "_vocab", "_meta", "_tags",
      "__stage_bigrams", "__stage_prefixes", "__stage_vocab",
      "__stage_meta", "__stage_tags", "__commit").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
  }

  test("tagRetention < 1 fails loudly: a retention that would drop the committing tag in its own swap is a caller bug, not a silent replay hole") {
    // (r14 ADVICE) retention 0 made `kept` empty — the tag being
    // committed vanished in the same staged swap, so an immediate
    // replay of that very batch double-counted silently
    val day = Seq((1L, "retention guard words")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      NgramLM.appendToStored(spark, s"lmreq_${System.nanoTime()}", day,
        "doc_id", "text", buckets = 4, batchTag = Some("t"), tagRetention = 0)
    }
    assert(e.getMessage.contains("tagRetention"))
  }

  test("streaming: likelihoodMass scores arrivals against a static model, matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val model = NgramLM.fit(corpus.toDF("doc_id", "text"), "doc_id", "text")
    val arrivals = Seq((11L, "the cat sat on a log"), (12L, "novel words entirely"))
    val input = MemoryStream[(Long, String)]
    val scored = NgramLM.likelihoodMass(
      input.toDS().toDF("doc_id", "text"), "doc_id", "text", model)
    val q = scored.writeStream.format("memory").queryName("lm_stream")
      .outputMode("complete").start()
    try {
      input.addData(arrivals)
      q.processAllAvailable()
      val got = spark.table("lm_stream").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("hit_mass"), r.getAs[Long]("prefix_mass"),
            r.getAs[Double]("score"))).toMap
      val want = NgramLM.likelihoodMass(
        arrivals.toDF("doc_id", "text"), "doc_id", "text", model)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("hit_mass"), r.getAs[Long]("prefix_mass"),
            r.getAs[Double]("score"))).toMap
      assert(got == want, s"stream scores must match batch: $got vs $want")
    } finally q.stop()
  }

  test("order 3: trigram count tables and masses match a sliding-window reference") {
    val docs = corpus.toDF("doc_id", "text")
    val model = NgramLM.fit(docs, "doc_id", "text", order = 3)
    assert(model.order == 3)
    // reference trigram model off the same corpus
    val grams3 = corpus.flatMap { case (_, t) =>
      val w = refTokens(t); if (w.length < 3) Nil else w.sliding(3).toSeq
    }
    val c3 = grams3.groupBy(identity).map { case (_, gs) => gs.size.toLong }
    assert(model.bigrams.count() == grams3.distinct.size)
    assert(model.bigrams.agg(org.apache.spark.sql.functions.sum("c2"))
      .head().getLong(0) == c3.sum)
    // prefixes are 2-token windows of docs long enough for a trigram
    val p2 = grams3.map(_.take(2)).distinct.size
    assert(model.prefixes.count() == p2)
    // mass parity per doc against the reference arithmetic
    val cnt3 = grams3.groupBy(identity).map { case (g, gs) => g -> gs.size.toLong }
    val cnt2 = grams3.groupBy(_.take(2)).map { case (p, gs) => p -> gs.size.toLong }
    val v = corpus.flatMap(c => refTokens(c._2)).distinct.size.toLong
    val expect = corpus.flatMap { case (id, t) =>
      val w = refTokens(t)
      if (w.length < 3) None else {
        val ws = w.sliding(3).toSeq
        Some(id -> (ws.map(g => cnt3(g) + 1).sum, ws.map(g => cnt2(g.take(2)) + v).sum))
      }
    }.toMap
    val got = NgramLM.likelihoodMass(docs, "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("hit_mass"), r.getAs[Long]("prefix_mass"))).toMap
    assert(got == expect)
    // merging across orders must fail loud, not corrupt counts
    val m2 = NgramLM.fit(docs, "doc_id", "text")
    intercept[IllegalArgumentException](NgramLM.merge(model, m2))
  }

  test("scoring a corpus with unseen grams takes the add-one floor, never NPE") {
    val train = corpus.toDF("doc_id", "text")
    val model = NgramLM.fit(train, "doc_id", "text")
    val unseen = Seq((9L, "completely novel words here")).toDF("doc_id", "text")
    val row = NgramLM.likelihoodMass(unseen, "doc_id", "text", model)
      .collect().head
    // every gram unseen: hit_mass = n_grams * 1, prefix_mass = n_grams * V
    assert(row.getAs[Long]("n_grams") == 3L)
    assert(row.getAs[Long]("hit_mass") == 3L)
    assert(row.getAs[Long]("prefix_mass") == 3L * model.vocabSize)
  }
}
