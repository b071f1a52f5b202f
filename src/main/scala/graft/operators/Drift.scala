package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — the temporal leg of data
  * validation ([[Validate]] checks rows against RULES; this checks a
  * batch against a REFERENCE DISTRIBUTION): histogram yesterday's
  * corpus once, store the edges and counts, and measure every new
  * batch's divergence with exact integer arithmetic.
  *
  * The drift statistic is total variation distance over the shared
  * binning, TVD = ½·Σ_bins |p_ref(b) − p_batch(b)|, computed with
  * cleared denominators so it is integer-EXACT and hash-certifiable:
  *
  *   l1_num = Σ_b |n_ref(b)·T_batch − n_batch(b)·T_ref|
  *   TVD    = l1_num / (2·T_ref·T_batch)
  *
  * (T = per-group totals). TVD ∈ [0,1]; alerting thresholds compose
  * with [[Outliers.flagAgainstProfile]] on the TVD column if desired.
  *
  * Scale shape: [[edges]] is one min/max aggregate over the reference;
  * [[histogram]] is one binned-count aggregate with the
  * group-cardinality-sized edge table broadcast to the scan; [[l1]]
  * joins two (groups × bins)-sized count tables — the corpora
  * themselves are each scanned once and never joined or shuffled
  * beyond their count aggregation.
  */
object Drift {

  /** Reference bin edges per group: `(group, vmin, w)` with
    * w = (max − min)/bins. Store this WITH the reference histogram —
    * batch binning must reuse it for the distance to mean anything.
    */
  def edges(df: DataFrame, groupCol: String, valueCol: String,
            bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val g = col(groupCol)
    val v = col(valueCol)
    df.where(v.isNotNull && g.isNotNull)
      .groupBy(g)
      .agg(min(v).as("vmin"), max(v).as("vmax"))
      .withColumn("w", (col("vmax") - col("vmin")) / lit(bins.toDouble))
      .select(g, col("vmin"), col("w"))
  }

  /** Histogram against FIXED edges: out-of-range values clamp into the
    * end bins (drift past the reference range shows up as mass piling
    * at bin 0 / bin B−1 rather than vanishing). Degenerate edges
    * (w = 0) put everything in bin 0. Groups absent from `edgesDf`
    * drop (no reference ⇒ no comparable histogram).
    */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
                edgesDf: DataFrame, bins: Int): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    df.where(v.isNotNull && g.isNotNull)
      .join(broadcast(edgesDf), groupCol)
      .withColumn("bin",
        when(col("w") === 0.0, lit(0L)).otherwise(
          greatest(lit(0L), least(lit(bins - 1L),
            floor((v - col("vmin")) / col("w")).cast("long")))))
      .groupBy(g, col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Categorical histogram — the no-binning counterpart of
    * [[histogram]] for discrete columns (language, source, label):
    * `(group, bin, n)` with the category itself as the bin. Feed two
    * of these to [[l1]] for categorical drift (lang-mix shift,
    * source-mix shift); categories unseen on one side count 0 there,
    * exactly like empty bins.
    */
  def categoricalHistogram(df: DataFrame, groupCol: String,
                           catCol: String): DataFrame = {
    val g = col(groupCol)
    val c = col(catCol)
    df.where(c.isNotNull && g.isNotNull)
      .groupBy(g, c.as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** A stored reference: edges + histogram persisted as tables (the
    * stored-model family's save/load convention — NgramLM, Bm25Index,
    * DedupIndex). Both tables are group-cardinality × bins sized, so
    * no bucketing is needed: they broadcast wherever they're used.
    */
  final case class Reference(edges: DataFrame, histogram: DataFrame, bins: Int)

  /** Compute and persist the reference for `df` under `name`
    * (`<name>_edges`, `<name>_hist`, `<name>_meta`). */
  def store(df: DataFrame, groupCol: String, valueCol: String,
            bins: Int, name: String): Reference = {
    val spark = df.sparkSession
    import spark.implicits._
    val e = edges(df, groupCol, valueCol, bins)
    e.write.mode("overwrite").saveAsTable(s"${name}_edges")
    val storedEdges = spark.table(s"${name}_edges")
    val h = histogram(df, groupCol, valueCol, storedEdges, bins)
    h.write.mode("overwrite").saveAsTable(s"${name}_hist")
    Seq(bins).toDF("bins").write.mode("overwrite").saveAsTable(s"${name}_meta")
    Reference(storedEdges, spark.table(s"${name}_hist"), bins)
  }

  def load(spark: org.apache.spark.sql.SparkSession, name: String): Reference =
    Reference(spark.table(s"${name}_edges"), spark.table(s"${name}_hist"),
      spark.table(s"${name}_meta").head().getInt(0))

  /** Score a batch against a stored reference: histogram with the
    * REFERENCE edges, then exact L1/TVD. The monitoring loop — batch
    * or per-micro-batch via foreachBatch (DriftSpec proves parity).
    */
  def scoreAgainst(ref: Reference, batch: DataFrame, groupCol: String,
                   valueCol: String): DataFrame =
    l1(ref.histogram, histogram(batch, groupCol, valueCol, ref.edges, ref.bins),
      groupCol)

  /** Exact L1 / total-variation drift between two histograms sharing a
    * binning. One row per group present in BOTH: per-group totals,
    * `l1_num` (the cleared-denominator L1 numerator, BIGINT-exact) and
    * `tvd` (single IEEE division). Bins missing on one side count 0.
    */
  def l1(ref: DataFrame, batch: DataFrame, groupCol: String): DataFrame = {
    val g = col(groupCol)
    val tRef = ref.groupBy(g).agg(sum(col("n")).as("t_ref"))
    val tBatch = batch.groupBy(g).agg(sum(col("n")).as("t_batch"))
    ref.select(g, col("bin"), col("n").as("n_ref"))
      .join(batch.select(g, col("bin"), col("n").as("n_batch")),
        Seq(groupCol, "bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_batch"))
      .join(broadcast(tRef), groupCol)
      .join(broadcast(tBatch), groupCol)
      .groupBy(g)
      .agg(
        min(col("t_ref")).as("t_ref"),
        min(col("t_batch")).as("t_batch"),
        sum(abs(col("n_ref") * col("t_batch") - col("n_batch") * col("t_ref")))
          .as("l1_num"))
      .withColumn("tvd",
        col("l1_num").cast("double") /
          (lit(2.0) * (col("t_ref") * col("t_batch")).cast("double")))
  }
}
