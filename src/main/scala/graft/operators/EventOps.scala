package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-event analytics over user streams — funnel completion and
  * cohort retention, the two workhorse queries run on the events a
  * loader like the reference lands in the warehouse (reference usage:
  * the Redshift-side analytics its README motivates the load FOR —
  * `/root/reference/README.md:21-28` positions the pipeline as feeding
  * exactly this kind of clickstream analysis; the loader itself stops
  * at COPY, so these are engine-side capabilities, not ports).
  *
  * Scale design (100 TB): both operators reduce events to per-user
  * contractions with ONE shuffle on the high-cardinality user key —
  * no window over a low-cardinality partition, no sequential
  * self-joins. Funnel matching folds each user's sorted step events
  * with a higher-order `aggregate` (codegen'd, no UDF); the collected
  * per-user list holds only events whose type is one of the funnel's
  * k steps (the `isin` filter sits on the scan), so its size is
  * bounded by per-user FUNNEL activity, not total activity.
  */
object EventOps {

  /** Per-user funnel completion times under strict step ordering:
    * `t(0)` is the user's earliest step-0 event; `t(i)` the earliest
    * step-i event at or after `t(i-1)` (and, when `maxStepGapMicros`
    * is set, within that many microseconds of it — the windowed-funnel
    * bound). Equal timestamps admit same-instant progression (a view
    * and its click in the same microsecond both count), matching the
    * relational formulation
    * `t_i = min(ts) FILTER (type = step_i AND ts >= t_{i-1} [AND ts <= t_{i-1}+gap])`
    * exactly: the fold scans ascending (ts, step_idx), so the first
    * admissible match IS the minimum. The chain is GREEDY — it anchors
    * on each step's earliest completion; a user who could complete
    * more steps by skipping an early event is counted by the greedy
    * chain, the standard windowed-funnel semantic (an optimal-chain
    * search is exponential in k and not what funnel dashboards mean).
    *
    * Returns one row per user with `times` (array of k nullable epoch-
    * micros longs) and `steps_completed` (longest completed prefix).
    */
  def funnelUsers(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  maxStepGapMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    val k = steps.size
    // step name -> index as a CASE chain (tiny, codegen'd); the isin
    // filter is the scan-pushed guard that bounds the per-user list
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    val slim = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        unix_micros(col(tsCol)).as("ts_us"),
        stepIdx.as("step"))
    // one shuffle: per-user sorted (ts, step) list, then a pure
    // expression fold filling the first admissible time per step.
    // transform's index is 0-based; element_at is 1-based, so
    // element_at(acc, i) is the PREVIOUS step's slot at index i.
    val gapGuard = maxStepGapMicros
      .map(g => s"AND e.ts_us <= element_at(acc, i) + ${g}L")
      .getOrElse("")
    val foldExpr =
      s"""aggregate(
         |  sort_array(collect_list(struct(ts_us, step))),
         |  array_repeat(CAST(NULL AS BIGINT), $k),
         |  (acc, e) -> transform(acc, (v, i) ->
         |    CASE WHEN v IS NOT NULL THEN v
         |         WHEN e.step != i THEN CAST(NULL AS BIGINT)
         |         WHEN i = 0 THEN e.ts_us
         |         WHEN element_at(acc, i) IS NOT NULL AND e.ts_us >= element_at(acc, i)
         |           $gapGuard
         |           THEN e.ts_us
         |         ELSE CAST(NULL AS BIGINT) END))""".stripMargin
    slim.groupBy(col(userCol))
      .agg(expr(foldExpr).as("times"))
      .withColumn("steps_completed",
        // longest prefix of non-null times: a later null ends the funnel
        // even if a deeper slot were somehow set (it cannot be, but the
        // prefix form makes the contract explicit)
        expr(s"""aggregate(times, named_struct('n', 0, 'open', true),
                 |  (st, t) -> IF(st.open AND t IS NOT NULL,
                 |                named_struct('n', st.n + 1, 'open', true),
                 |                named_struct('n', st.n, 'open', false)),
                 |  st -> st.n)""".stripMargin))
  }

  /** Classic funnel rollup: for each step, how many users completed it
    * (reached at least that depth). Output is k rows
    * (step 1-based, step_type, n_users) — integers end to end, so the
    * whole operator is hash-certifiable against the sequential min-if
    * relational form.
    */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   maxStepGapMicros: Option[Long] = None): DataFrame = {
    val users = funnelUsers(events, userCol, typeCol, tsCol, steps, maxStepGapMicros)
    val stepNames = array(steps.map(lit): _*)
    users
      .select(explode(sequence(lit(1), lit(steps.size))).as("step"),
        col("steps_completed"))
      .groupBy(col("step"))
      .agg(sum(when(col("steps_completed") >= col("step"), 1L).otherwise(0L))
        .as("n_users"))
      .withColumn("step_type", element_at(stepNames, col("step")))
      .select(col("step").cast("long").as("step"), col("step_type"), col("n_users"))
  }

  /** Cohort retention: users are cohorted by the day of their first
    * `cohortType` event; a user is active in day-offset d if they have
    * ANY event d days after their cohort day. Output is one row per
    * (cohort_day, day_offset) with the distinct active-user count —
    * the retention triangle.
    *
    * Shuffles: distinct on (user, day), groupBy user for the cohort
    * anchor, an equi-join on user, then a groupBy on the tiny
    * (cohort_day, offset) key — nothing partitioned low-cardinality,
    * nothing sorted. Days before the cohort anchor are excluded.
    */
  def cohortRetention(events: DataFrame, userCol: String, typeCol: String,
                      tsCol: String, cohortType: String): DataFrame = {
    val days = events.select(col(userCol).as("user"),
      col(typeCol).as("etype"), to_date(col(tsCol)).as("day"))
    val cohorts = days.filter(col("etype") === cohortType)
      .groupBy(col("user")).agg(min(col("day")).as("cohort_day"))
    val active = days.select(col("user"), col("day")).distinct()
    active.join(cohorts, "user")
      .filter(col("day") >= col("cohort_day"))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user")).as("n_active"))
  }

  /** Column helper: epoch microseconds of a timestamp column (the
    * funnel's time axis; integer so every comparison is exact).
    */
  def epochMicros(c: Column): Column = unix_micros(c)

  /** Gap-based sessionization: a user's events sorted by
    * `(ts, tieCol)` start a new session whenever the gap from the
    * previous event exceeds `gapMicros`. Returns the input plus
    * `ts_us` and a per-user 1-based `session_idx`.
    *
    * Scale design (100 TB): the only shuffle is the window partitioned
    * by the HIGH-cardinality user key — per-task input is one user's
    * events, never a global or low-cardinality sort (the
    * QueryPlanPoliceSpec invariant). Session numbering is the classic
    * boundary-flag cumulative sum; tied timestamps have gap 0, so they
    * can never open a session and the assignment is order-independent
    * across ties — `tieCol` still pins a total order so the oracle
    * replays the identical frame.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapMicros: Long, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col("ts_us"), col(tieCol))
    events
      .withColumn("ts_us", unix_micros(col(tsCol)))
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapMicros, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx",
        (sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)) + 1L).cast("long"))
      .drop("new_sess")
  }

  /** Per-session rollup over [[sessionize]]: one row per
    * (user, session) with the event count, start/end epoch-micros and
    * integer duration. Integers end to end — hash-certifiable against
    * the relational lag/cumsum form.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   gapMicros: Long, tieCol: String): DataFrame =
    sessionize(events, userCol, tsCol, gapMicros, tieCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))

  /** First-order event-type transition counts (the Markov-chain view
    * of user journeys): for each user's events under the total order
    * `(ts, tieCol)`, count consecutive `(prev_type, next_type)` pairs,
    * and clear the per-prev transition probability to integer
    * micro-units (`(n·10⁶) div total_from_prev` — the repo's rational
    * convention, so the whole matrix hash-certifies).
    *
    * One high-cardinality user window for the lag, then hash
    * aggregates on the tiny (prev, next) key — no low-cardinality
    * sort anywhere. Ties matter here (unlike [[sessionize]] the pair
    * VALUES depend on order), which is why `tieCol` is required: both
    * engines replay the identical (ts, tie) frame.
    */
  def transitionCounts(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(tieCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("next_type"),
        lag(col(typeCol), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    // the second window runs over the (types × types)-sized count
    // table, not the corpus — bounded rows, any partitioning is fine
    pairs
      .withColumn("p_micro",
        expr("CAST((n_trans * 1000000) div sum(n_trans) " +
          "OVER (PARTITION BY prev_type) AS BIGINT)"))
  }

  /** Markov absorption probability: from each state, the probability
    * of REACHING `targetType` within `steps` transitions under the
    * empirical first-order chain of [[transitionCounts]] — "how
    * likely is a user three clicks from purchase", the
    * funnel-discovery readout that needs no hand-declared step list
    * (Kemeny & Snell 1960, absorbing-chain fundamental recursion,
    * truncated at k steps). The target is ABSORBING: once reached it
    * stays reached, so p_k is monotone in k.
    *
    * Exactness: the recursion quantizes per round to micro-units,
    *   p'(s) = (Σ_next n_trans(s, next) · p(next)) div n_out(s),
    * p'(target) = 10⁶ — every operation integer (the q114 unrolled-
    * round convention; < 1 µunit floor loss per round). Magnitude:
    * Σ n·p ≤ n_out·10⁶ — safe to ~9·10¹² outgoing transitions per
    * state in BIGINT.
    *
    * Scale shape: the one corpus-sized pass is transition extraction
    * (per-user lag window — high-cardinality key); every round then
    * iterates on the (states × states) count contraction — tiny, one
    * keyed join + aggregate per round. Returns `(state, p_micro)`
    * for every observed state after `steps` rounds.
    */
  def absorptionWithin(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String, targetType: String,
                       steps: Int): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val t = transitionCounts(events, userCol, typeCol, tsCol, tieCol)
      .select(col("prev_type"), col("next_type"), col("n_trans"))
      .localCheckpoint()
    val outTot = t.groupBy(col("prev_type")).agg(sum(col("n_trans")).as("n_out"))
    val states = t.select(col("prev_type").as("state"))
      .union(t.select(col("next_type").as("state"))).distinct()
      .localCheckpoint()
    var p = states.withColumn("p_micro",
      when(col("state") === targetType, lit(1000000L)).otherwise(lit(0L)))
    for (_ <- 1 to steps) {
      val mass = t
        .join(p.select(col("state").as("next_type"), col("p_micro")),
          "next_type")
        .groupBy(col("prev_type"))
        .agg(sum(col("n_trans") * col("p_micro")).as("mass"))
        .join(outTot, "prev_type")
        .select(col("prev_type").as("state"),
          expr("mass div n_out").as("reach"))
      p = states
        .join(mass, Seq("state"), "left")
        .select(col("state"),
          when(col("state") === targetType, lit(1000000L))
            .otherwise(coalesce(col("reach"), lit(0L))).as("p_micro"))
        .localCheckpoint()
    }
    p
  }

  /** Top session paths (the product-analytics "user flows" view):
    * sessions from [[sessionize]], each represented by its first
    * `maxSteps` event types under the `(ts, tieCol)` total order
    * joined with `>`, rolled up to one row per distinct path with
    *
    *  - `n_sessions` — sessions following the path prefix
    *  - `n_complete` — of those, sessions that END within `maxSteps`
    *    (so `n_sessions − n_complete` counts truncated journeys)
    *
    * Scale design: both windows (session numbering, step ranking)
    * partition on the high-cardinality user / (user, session) keys;
    * the per-session path build is a hash aggregate whose
    * `collect_list` is bounded by `maxSteps` (the `when` filter runs
    * BEFORE collection — nulls are skipped, never collected); the
    * final rollup groups by path. No low-cardinality sort anywhere;
    * counts are exact integers, so the whole view hash-certifies.
    */
  def sessionPaths(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, tieCol: String, gapMicros: Long,
                   maxSteps: Int): DataFrame = {
    require(maxSteps >= 1, "maxSteps must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val sess = sessionize(events, userCol, tsCol, gapMicros, tieCol)
    val w = Window.partitionBy(col(userCol), col("session_idx"))
      .orderBy(col("ts_us"), col(tieCol))
    val perSession = sess
      .withColumn("step", row_number().over(w))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("step") <= maxSteps,
              struct(col("step"), col(typeCol).as("t"))))),
            x => x.getField("t")),
          ">").as("path"),
        count(lit(1)).as("n_steps"))
    perSession.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_steps") <= maxSteps, 1L).otherwise(0L))
          .cast("long").as("n_complete"))
  }

  /** Consecutive-day activity streaks (gaps-and-islands over the
    * calendar): per user, distinct active days group into runs of
    * consecutive dates via the classic `day − row_number` anchor (two
    * days are in the same run iff the difference is constant), then
    * per-user `longest_streak` / `n_streaks` / `n_active_days`. The
    * calendar-day sibling of [[sessionize]]'s time-gap islands.
    *
    * Scale: the (user, day) distinct contraction first, ONE window
    * partitioned by the high-cardinality user (per-task input = one
    * user's active days), then hash aggregates. All integers — exact.
    */
  def streaks(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user"), col(tsCol).cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user")).orderBy(col("day"))
    days
      .withColumn("rn", row_number().over(w))
      .withColumn("anchor", expr("date_sub(day, rn)"))
      .groupBy(col("user"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user"))
      .agg(max(col("len")).cast("long").as("longest_streak"),
        count(lit(1)).cast("long").as("n_streaks"),
        sum(col("len")).cast("long").as("n_active_days"))
  }

  /** Slowly-changing-dimension type 2 from an event stream: per key,
    * collapse consecutive runs of an unchanged attribute into validity
    * intervals `[valid_from, valid_to)` under the (ts, tie) total
    * order — the warehouse dimension-versioning build (Kimball SCD-2)
    * whose point-in-time lookup is then [[AsofJoin]]. Two windows,
    * both partitioned on the high-cardinality key: a lag to find
    * change points (null-safe, so null attributes form runs too) and
    * a lead over the CHANGE POINTS for each interval's end. The open
    * current version has `valid_to` null.
    */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)), col(tieCol))
    val changes = events
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol),
        lag(col(attrCol), 1).over(w).as("__prev"),
        lag(lit(1), 1).over(w).as("__has_prev"))
      .filter(col("__has_prev").isNull || !(col(attrCol) <=> col("__prev")))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Engagement metrics — exact DAU / trailing-window WAU / MAU per
    * active day, the growth-accounting readout every product
    * warehouse runs. One (user, day) dedup pass, then each active day
    * collects the users of its trailing `mauDays` window via a
    * range-condition join against the (tiny, broadcast) day list and
    * counts the three windows in ONE aggregate (conditional distinct
    * counts). Stickiness = dau/mau is the callers' one division.
    *
    * Exact-rolling-distinct cost is inherent: each (user, day) row
    * fans out to ≤ `mauDays` anchor days, so the shuffle is
    * |user-days|·window — the EXACT path for bounded day ranges. For
    * unbounded horizons or billion-user days, the mergeable-sketch
    * family ([[Sketches]] per-day HLL union'd over the window) is the
    * approximate alternative; this operator is the ground truth it
    * brackets against.
    */
  def engagement(events: DataFrame, userCol: String, tsCol: String,
                 wauDays: Int = 7, mauDays: Int = 30): DataFrame = {
    require(wauDays >= 1 && mauDays >= wauDays, "need 1 <= wauDays <= mauDays")
    val ud = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .where(col("u").isNotNull && col("day").isNotNull)
      .distinct()
    val days = ud.select(col("day").as("anchor")).distinct()
    ud.join(broadcast(days),
        col("day") > date_sub(col("anchor"), mauDays) && col("day") <= col("anchor"))
      .groupBy(col("anchor"))
      .agg(
        countDistinct(when(col("day") === col("anchor"), col("u"))).as("dau"),
        countDistinct(when(col("day") > date_sub(col("anchor"), wauDays), col("u")))
          .as("wau"),
        countDistinct(col("u")).as("mau"))
      // day emitted as its ISO string: cross-engine DATE surfacing
      // differs (date32 objects vs datetime64) and breaks the canon
      // compare; the string form is identical everywhere
      .select(col("anchor").cast("string").as("day"),
        col("dau"), col("wau"), col("mau"))
  }

  /** Multi-touch attribution — the fractional-credit generalization of
    * the as-of last-touch policy (q159): every touchpoint inside a
    * conversion's lookback window earns a share of the conversion's
    * revenue. Policies:
    *
    *  - `"linear"`: each of the n touches gets `rev_micro div n`.
    *  - `"u40"`: position-based 40/20/40 (the "U-shaped" industry
    *    standard) — first touch 40%, last touch 40%, the middle n−2
    *    split the remaining 20%; n = 1 takes all, n = 2 split 50/50.
    *
    * Credits are EXACT integers in micro-revenue units (truncating
    * div; the ≤ n-micro rounding remainder per conversion is the
    * documented cost of engine-replayable integer credit).
    *
    * Scale shape: the touch↔conversion match is
    * [[RangeJoin.pointInInterval]] on (user, time-bucket) — a plain
    * shuffled equi-join, never a nested loop; per-conversion counts
    * and first/last selection are ONE hash aggregate on the
    * conversion id (max/min over (ts, touch-id) structs — no window,
    * skew-immune) joined back by id. Returns one row per credited
    * (conversion, touch) with `credit_micro`; roll up by channel
    * downstream.
    */
  def multiTouchAttribution(conversions: DataFrame, touches: DataFrame,
                            userCol: String, tsCol: String,
                            convIdCol: String, revCol: String,
                            touchIdCol: String, channelCol: String,
                            lookbackSec: Long, policy: String = "linear",
                            bucketWidth: Long = 3600L): DataFrame = {
    require(Seq("linear", "u40").contains(policy), s"unknown policy $policy")
    require(lookbackSec > 0, "lookbackSec must be positive")
    val conv = conversions.select(
      col(userCol).as("u"), col(convIdCol).as("conv_id"),
      col(tsCol).cast("long").as("conv_ts"), col(revCol).as("rev"))
      .withColumn("w_start",
        greatest(lit(0L), col("conv_ts") - lit(lookbackSec)))
      .withColumn("w_end", col("conv_ts") - 1L) // strictly before conversion
    val tch = touches.select(
      col(userCol).as("u"), col(touchIdCol).as("touch_id"),
      col(tsCol).cast("long").as("touch_ts"), col(channelCol).as("channel"))
    val matched = RangeJoin.pointInInterval(
        tch, conv, keys = Seq("u"), ptCol = "touch_ts",
        startCol = "w_start", endCol = "w_end", bucketWidth = bucketWidth)
      .select(col("u"), col("i_conv_id").as("conv_id"), col("i_rev").as("rev"),
        col("touch_id"), col("touch_ts"), col("channel"))
    val perConv = matched.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_touches"),
        min(struct(col("touch_ts"), col("touch_id"))).as("__first"),
        max(struct(col("touch_ts"), col("touch_id"))).as("__last"))
      .select(col("conv_id"), col("n_touches"),
        col("__first.touch_id").as("first_id"),
        col("__last.touch_id").as("last_id"))
    val credited = matched.join(perConv, "conv_id")
      .withColumn("rev_micro", col("rev").cast("long") * lit(1000000L))
      .withColumn("pos",
        when(col("touch_id") === col("first_id"), lit("first"))
          .when(col("touch_id") === col("last_id"), lit("last"))
          .otherwise(lit("middle")))
    val credit = policy match {
      case "linear" => expr("rev_micro div n_touches")
      case "u40" =>
        when(col("n_touches") === 1, col("rev_micro"))
          .when(col("n_touches") === 2, expr("rev_micro div 2"))
          .when(col("pos") === "first" || col("pos") === "last",
            expr("(rev_micro * 2) div 5"))
          .otherwise(expr("(rev_micro div 5) div (n_touches - 2)"))
    }
    credited
      .withColumn("credit_micro", credit)
      .select(col("conv_id"), col("touch_id"), col("channel"), col("pos"),
        col("n_touches"), col("credit_micro"))
  }
}
