package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-4 product-analytics wave: funnel conversion, cohort retention,
  * winsorized robust statistics, grouping sets, and pivot — the
  * reporting surface a warehouse user expects from a complete engine.
  *
  * 100 TB design notes:
  *  - q97's funnel is three keyed aggregations chained by user_id joins
  *    — each step's survivor set shrinks, so later joins move less data;
  *    no window over the full event stream, no per-user event buffering.
  *  - q98 reduces events to (user, week) pairs FIRST (distinct on an
  *    8+8-byte key), then assigns cohorts with one more keyed join —
  *    the classic two-pass retention shape; nothing ever materializes a
  *    per-user event list.
  *  - q99 computes the global clip bounds once (Spark `percentile` ≡
  *    DuckDB `quantile_cont` — same interpolation, verified exact in
  *    round 3's q75 work), broadcasts the 1-row bound set, and clips in
  *    a row-local map; sums are integer cents so partial aggregation
  *    order cannot drift the result.
  *  - q100/q101 are single hash aggregations (grouping-set expansion
  *    and conditional aggregation respectively) — Spark expands
  *    GROUPING SETS into one Expand + one aggregate, not N scans.
  *  - all timestamps flow as integer epoch-microseconds (q90's
  *    precedent), all day/week math is integer floor division.
  */
object AnalyticsQueries extends QueryPack {

  private val DayUs = 86400000000L

  // q97: 3-step funnel (signup -> click -> purchase, strictly ordered) ----

  /** Production form: [[graft.functions.Funnel]] — one shuffle, one
    * pass, O(steps) state. */
  def q97(s: SparkSession, d: String): DataFrame =
    graft.functions.Funnel.funnelCounts(
      Tables.events(s, d).withColumn("tus", unix_micros(col("ts"))),
      "user_id", "event_type", "tus", Seq("signup", "click", "purchase"))

  /** Join-chain reference implementation (the oracle SQL's literal
    * shape) — kept for the AnalyticsSpec equivalence proof; N scans of
    * the event table, so never the production path. */
  private[graft] def q97JoinForm(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("tus"))
    val t1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("tus")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, Seq("user_id")).filter(col("tus") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id")).filter(col("tus") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t3"))
    val steps = Seq((1L, t1), (2L, t2), (3L, t3)).map { case (step, df) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(step).as("step"), col("n_users"))
    }
    steps.reduce(_.unionByName(_)).orderBy(col("step"))
  }

  // q98: weekly cohort retention ------------------------------------------

  def q98(s: SparkSession, d: String): DataFrame = {
    val uw = Tables.events(s, d)
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV ${DayUs * 7}").as("week"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    uw.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("offset_w"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("offset_w"))
  }

  // q99: winsorized robust statistics per event type ----------------------

  def q99(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"))
    val bounds = e.agg(
      floor(percentile(col("cents"), lit(0.05))).cast("long").as("lo"),
      floor(percentile(col("cents"), lit(0.95))).cast("long").as("hi"))
    e.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        greatest(col("lo"), least(col("hi"), col("cents"))).as("clip"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("clip")).as("sum_clip"))
      .select(col("event_type"), col("n"), col("sum_clip"),
        expr("CAST((sum_clip * 100L) DIV n AS BIGINT)").as("avg_clip_cc"))
      .orderBy(col("event_type"))
  }

  // q100: GROUPING SETS with grouping_id ----------------------------------

  def q100(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("g100_documents")
    s.sql("""
      SELECT lang, source, grouping(lang) AS g_lang, grouping(source) AS g_source,
             count(1) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM g100_documents
      GROUP BY GROUPING SETS ((lang), (source), ())
      ORDER BY g_lang, g_source, lang NULLS FIRST, source NULLS FIRST""")
  }

  // q101: pivot (wide per-language doc counts per source) -----------------

  /** The pivoted language set — fixed and driver-known, as a pivot's
    * output schema must be (FIXTURES.md: lang ∈ {en,de,zh,fr,es}). */
  val PivotLangs = Seq("de", "en", "es", "fr", "zh")

  def q101(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .groupBy(col("source"))
      .pivot("lang", PivotLangs)
      .agg(count(lit(1)))
      .na.fill(0L, PivotLangs)
      .orderBy(col("source"))
  }

  // q113: time-series gap fill (daily resample + forward fill) ------------

  /** Regularize each user's event stream onto a daily grid and
    * forward-fill missing days — the resample/imputation primitive
    * (pandas `resample().ffill()`, Flink windowed fill) every
    * time-series consumer expects.
    *
    * Scale shape: the grid is a row-local `sequence` explode per user
    * (span-bounded, no calendar-table join, no cross join); the fill is
    * ONE window over (user, day) — the same single shuffle the daily
    * aggregation already needs, and per-user state during the fill is
    * one running value. Day ids and cents are integer floor division —
    * exact in both engines. */
  def q113(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $DayUs").as("day"),
        floor(col("value") * 100).as("cents"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("cents")).as("cents"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("cents"), ignoreNulls = true).over(w).as("cents"),
        col("cents").isNotNull.cast("int").as("observed"))
      .orderBy(col("user_id"), col("day"))
  }

  // q121: SCD2 dimension build (validity intervals from an event log) ----

  /** Type-2 slowly-changing-dimension compaction (Kimball's SCD2): per
    * user, collapse consecutive events with the same state
    * (event_type) into one row with [valid_from, valid_to) validity
    * and an is_current flag — the standard islands-and-gaps build of a
    * versioned dimension from a CDC/event stream. Ties on ts break by
    * event_id, giving both engines a total event order.
    *
    * Scale shape: one shuffle on user_id feeds every window (lag,
    * running change-count, lead) and the interval aggregate — Catalyst
    * reuses the single sort (user_id, tus, event_id) across all three;
    * state rides as a dictionary-encoded short string, and output rows
    * are one per RUN of equal states, typically ≪ event count. */
  def q121(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byEv = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val iv = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(byEv))
      .withColumn("chg", when(col("prev").isNull || col("prev") =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(byEv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("event_type")).as("state"), min(col("tus")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    // state breaks (valid_from) ties: two adjacent intervals share their
    // start when a user has same-µs events of different types — rare but
    // real at corpus scale, and without the tiebreak the lead() pairing
    // and the total ORDER BY would be engine-dependent
    val byIv = Window.partitionBy(col("user_id")).orderBy(col("valid_from_us"), col("state"))
    iv.withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byIv))
      .select(col("user_id"), col("state"), col("valid_from_us"), col("valid_to_us"),
        col("n_events"),
        when(col("valid_to_us").isNull, 1).otherwise(0).as("is_current"))
      .orderBy(col("user_id"), col("valid_from_us"), col("state"))
  }

  // q125: event-transition matrix (first-order Markov analytics) ---------

  /** Per-user event-to-next-event transition counts and probabilities —
    * the path-analysis primitive behind "what do users do after X"
    * dashboards and Markov attribution models. Events are totally
    * ordered per user by (ts, event_id) (q121's tiebreak precedent);
    * each consecutive pair votes for one (src → dst) cell; probability
    * is integer thousandths by floor division, so the matrix is exact.
    *
    * Scale shape: ONE shuffle on user_id feeds the lead() window; the
    * pair stream then map-combines into at most |types|² = 25 rows, so
    * the second exchange carries a bounded aggregate no matter the
    * corpus. The per-src total is a window over that 25-row frame —
    * never a second pass over events. */
  def q125(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byEv = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type").as("src"), col("event_id"))
      .withColumn("dst", lead(col("src"), 1).over(byEv))
      .filter(col("dst").isNotNull)
    pairs.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .withColumn("p_k", expr("n * 1000 div sum(n) over (partition by src)"))
      .select(col("src"), col("dst"), col("n"), col("p_k"))
      .orderBy(col("src"), col("dst"))
  }

  // q127: CDC apply — changelog → snapshot with delete tombstones --------

  /** Apply a change stream to an (empty) snapshot — the MERGE INTO /
    * upsert primitive of incremental ingest: per key the LAST change on
    * the (ts, event_id) total order wins, and a tombstone ('error'
    * events stand in for deletes) removes the key from the snapshot
    * entirely. Complements q10 (plain latest-per-key: no tombstones)
    * and q107 (snapshot diff: the other direction of the CDC loop).
    *
    * Scale shape: ONE shuffle on user_id; the per-key fold is a single
    * max_by aggregation (no window, no sort of the full log — partial
    * aggregation keeps one candidate row per key per task, so a 100 TB
    * changelog reduces map-side). Deletes filter AFTER the fold: a
    * key whose last change is a tombstone exits the snapshot no matter
    * how many upserts preceded it. */
  def q127(s: SparkSession, d: String): DataFrame =
    graft.streaming.Streaming.cdcSnapshot(Tables.events(s, d))
      .orderBy(col("user_id"))

  // q128: robust outliers via median absolute deviation ------------------

  /** Per-event-type robust outlier counts: median and MAD (median of
    * |x − med|) instead of q106's mean/σ — immune to the very outliers
    * being hunted. Flag threshold is the documented integer multiplier
    * |x − med| > 5·MAD (≈ 3.4σ for a normal core). Both medians are
    * exact percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`,
    * the round-3 q75 identity); cents are integers so every median is
    * a half-integer — binary-exact, and 2·med / 2·MAD ship as BIGINTs.
    *
    * Scale shape: two keyed aggregations over (type, cents) with a
    * 5-row broadcast of the medians between them — never a window over
    * the event stream; the second pass re-reads the scan rather than
    * materializing a corpus-sized intermediate. */
  def q128(s: SparkSession, d: String): DataFrame = {
    val cents = Tables.events(s, d)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
    val med = cents.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = cents.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("cents") - col("med")))
    val stats = dev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), first(col("med")).as("medv"),
        expr("percentile(adev, 0.5)").as("mad"))
    val outliers = dev
      .join(broadcast(stats.select(col("event_type"), col("mad"))), "event_type")
      .filter(col("adev") > col("mad") * 5)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_outliers"))
    // med is a half-integer (2·med integral) and mad a quarter-integer
    // (4·mad integral) — shipping med_x2/mad_x4 keeps the casts exact,
    // sidestepping the Spark-truncates vs DuckDB-rounds cast divergence
    stats.join(outliers, Seq("event_type"), "left")
      .na.fill(0L, Seq("n_outliers"))
      .select(col("event_type"), col("n"),
        (col("medv") * 2).cast("long").as("med_x2"),
        (col("mad") * 4).cast("long").as("mad_x4"), col("n_outliers"))
      .orderBy(col("event_type"))
  }

  // q131: linear multi-touch attribution ---------------------------------

  /** q25/q85 answer LAST-touch attribution; marketing analytics also
    * wants the linear multi-touch model — every click in the 7-day
    * lookback before a purchase shares the conversion credit equally
    * (1000‰ split as floor(1000/n) per click, deterministic on both
    * engines).
    *
    * Scale shape: the candidate join is EQUI on user_id with the 7-day
    * lookback as a residual range predicate — a hash join whose
    * per-user candidate volume is bounded by that user's activity, not
    * the corpus (the pure-range all-users form is q103/q117's
    * territory). Per-purchase click counts are one map-combined agg on
    * the already-shuffled user key; the user rollup reuses the same
    * partitioning. */
  def q131(s: SparkSession, d: String): DataFrame = {
    val SevenDaysUs = 7L * 24 * 3600 * 1000000
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("tus").as("p_tus"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tus").as("c_tus"))
    val touched = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_tus") <= col("p_tus") &&
          col("c_tus") > col("p_tus") - SevenDaysUs)
      .groupBy(col("user_id"), col("p_id"))
      .agg(count(lit(1)).as("n_touch"))
      .withColumn("credit", expr("(1000L DIV n_touch) * n_touch"))
    purchases.join(touched, Seq("user_id", "p_id"), "left")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("n_touch")).as("n_attributed"),
        coalesce(sum(col("credit")), lit(0L)).as("credit_sum"))
      .orderBy(col("user_id"))
  }

  // q138: top converting session paths ------------------------------------

  /** Path analytics — the top event-type sequences that END in a
    * conversion, the product-analytics question q97's fixed funnel
    * can't answer (q97 checks ONE ordained order; this discovers the
    * orders that actually happen). Sessions are 2-hour-gap
    * gaps-and-islands; each session's path is its first ≤8 events
    * joined with '>' (the cap bounds per-session state under any
    * activity skew — q110's degree-cap discipline applied to paths);
    * converted = the capped prefix contains a purchase.
    *
    * Scale shape: ONE user_id shuffle feeds the lag, the running
    * session sum, and the in-session row numbers (identical ordering,
    * shared Exchange+Sort); the cap filter runs BEFORE the path
    * aggregation so no task ever buffers an unbounded session; the
    * final path rollup moves ≤8-type strings, and top-10 is a bounded
    * sort. */
  def q138(s: SparkSession, d: String): DataFrame = {
    val GapUs = 7200000000L
    val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"))
    val wU = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val wRun = wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = ev
      .withColumn("prev", lag(col("tus"), 1).over(wU))
      .withColumn("cut",
        (col("prev").isNull || col("tus") - col("prev") > GapUs).cast("int"))
      .withColumn("sid", sum(col("cut")).over(wRun))
    val wS = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("tus"), col("event_id"))
    sess
      .withColumn("rn", row_number().over(wS)).filter(col("rn") <= 8)
      .groupBy(col("user_id"), col("sid"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("tus"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), ">").as("path"),
        max((col("event_type") === "purchase").cast("int")).as("converted"))
      .filter(col("converted") === 1)
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(10)
  }

  // q142: A/B experiment analysis (exact-integer chi-square) -------------

  /** Experiment readout without floats: users hash-split into arms A/B
    * (user_id mod 2 — stand-in for an assignment column), per-arm
    * conversion = "did the user emit this event_type at least once",
    * and the 2×2 chi-square independence test evaluated ENTIRELY by
    * cross-multiplication — n·(ad−bc)²·1000 > 3841·(a+b)(c+d)(a+c)(b+d)
    * is exactly χ² > 3.841 (p < 0.05, df=1) with zero division and
    * zero floats; DECIMAL(38,0) arithmetic ≡ DuckDB HUGEINT (q106's
    * contract) keeps the ~10²⁰ intermediate exact on both engines.
    *
    * Scale shape: one distinct (user, type) reduction (map-combined),
    * one |users|-row arm/conversion rollup, then a |types|-row 2×2
    * evaluation — the corpus is touched once; the test is arithmetic
    * on five rows. */
  def q142(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .select(col("user_id"), col("event_type")).distinct()
    val users = Tables.events(s, d).select(col("user_id")).distinct()
      .withColumn("arm", (col("user_id") % 2).cast("int"))
    // arm sizes as a 1-row broadcast (q99's global-scalar pattern — no
    // driver-side collect in the query body)
    val sizes = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
    val conv = perUser.join(users, Seq("user_id"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("conv_b"))
    conv.crossJoin(broadcast(sizes))
      .selectExpr("event_type", "conv_a", "n_a", "conv_b", "n_b",
        // a=conv_a, b=n_a-conv_a, c=conv_b, d=n_b-conv_b
        """CAST(CASE WHEN
             CAST(n_a + n_b AS DECIMAL(38,0)) *
             CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS DECIMAL(38,0)) *
             CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS DECIMAL(38,0)) * 1000 >
             3841 * CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)) *
             CAST(conv_a + conv_b AS DECIMAL(38,0)) *
             CAST(n_a + n_b - conv_a - conv_b AS DECIMAL(38,0))
           THEN 1 ELSE 0 END AS INT) AS significant""",
        """CAST(CASE WHEN conv_a * n_b > conv_b * n_a THEN 1
                WHEN conv_a * n_b < conv_b * n_a THEN -1 ELSE 0 END AS INT) AS direction""")
      .orderBy(col("event_type"))
  }

  // q143: cross-metric correlation matrix --------------------------------

  /** The metrics-health question "which KPIs move together": Pearson
    * correlation between every pair of event_type daily-value series —
    * q76's exact-moment discipline applied to the |types|² matrix. The
    * corpus is touched ONCE (the map-combined daily rollup); the
    * day-keyed self-join and the moment aggregation run over the
    * |days|·|types| metadata table, so the matrix costs arithmetic,
    * not scans. Integer cent sums feed the double formula — both
    * engines cast the same exact integers, so the floored 1e6
    * fixed-point correlation is bit-identical. */
  def q143(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type"), dayofmonth(col("ts")).as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("v"))
    val a = daily.select(col("event_type").as("ta"), col("day"), col("v").as("va"))
    val b = daily.select(col("event_type").as("tb"), col("day"), col("v").as("vb"))
    val g = a.join(b, Seq("day")).filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("va")).cast("double").as("sx"),
        sum(col("vb")).cast("double").as("sy"),
        sum(col("va") * col("vb")).cast("double").as("sxy"),
        sum(col("va") * col("va")).cast("double").as("sxx"),
        sum(col("vb") * col("vb")).cast("double").as("syy"))
    val nD = col("n_days").cast("double")
    val vx = nD * col("sxx") - col("sx") * col("sx")
    val vy = nD * col("syy") - col("sy") * col("sy")
    // zero-variance guard: a constant daily series makes corr 0/0 = NaN,
    // where Spark's floor(NaN).cast(long) yields NULL but DuckDB's CAST
    // raises — emit NULL explicitly (and identically in the oracle)
    val corr = (nD * col("sxy") - col("sx") * col("sy")) / (sqrt(vx) * sqrt(vy))
    g.select(col("ta"), col("tb"), col("n_days"),
        when(vx > 0 && vy > 0, floor(corr * 1e6).cast("long")).as("corr_fp"))
      .orderBy(col("ta"), col("tb"))
  }

  // q144: rolling 7-day active users (WAU per day) -----------------------

  /** The DAU/WAU staple: for every day, how many DISTINCT users were
    * active in the trailing 7-day window. Naively this is 30 separate
    * COUNT(DISTINCT) scans or a giant window-distinct; the scalable
    * form reduces the corpus to distinct (user, day) pairs FIRST
    * (map-combined — the only corpus-sized stage), then each pair
    * fans out to the ≤7 window-ends it contributes to (a bounded
    * generator, q113's sequence discipline), and one distinct
    * aggregation per (window_end, user) yields the counts. Shuffles
    * carry (user_id, day) — never events. */
  def q144(s: SparkSession, d: String): DataFrame = {
    val userDays = Tables.events(s, d)
      .select(col("user_id"), dayofmonth(col("ts")).as("day")).distinct()
    val maxDay = 31
    userDays
      .select(col("user_id"),
        explode(sequence(col("day"), least(col("day") + 6, lit(maxDay)))).as("wend"))
      .distinct()
      .groupBy(col("wend"))
      .agg(count(lit(1)).as("wau"))
      .select(col("wend").cast("long").as("day"), col("wau"))
      .orderBy(col("day"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q144_rolling_wau"  -> q144 _,
    "q143_metric_corr"  -> q143 _,
    "q142_ab_chisquare" -> q142 _,
    "q138_session_paths" -> q138 _,
    "q131_linear_attribution" -> q131 _,
    "q127_cdc_apply"  -> q127 _,
    "q128_mad_outliers" -> q128 _,
    "q125_event_transitions" -> q125 _,
    "q121_scd2_intervals" -> q121 _,
    "q97_funnel"        -> q97 _,
    "q98_retention"     -> q98 _,
    "q99_winsorize"     -> q99 _,
    "q100_grouping_sets" -> q100 _,
    "q101_pivot"        -> q101 _,
    "q113_gapfill"      -> q113 _
  )

  override val oracle: Map[String, String] = Map(
    "q144_rolling_wau" -> """
      WITH ud AS (SELECT DISTINCT user_id, day(ts) AS day FROM events),
      f AS (SELECT DISTINCT user_id, wend FROM (
              SELECT user_id,
                     unnest(generate_series(day, LEAST(day + 6, 31))) AS wend
              FROM ud))
      SELECT CAST(wend AS BIGINT) AS day, CAST(COUNT(*) AS BIGINT) AS wau
      FROM f GROUP BY wend ORDER BY day""",
    "q143_metric_corr" -> """
      WITH daily AS (
        SELECT event_type, day(ts) AS day,
               SUM(CAST(floor(value * 100) AS BIGINT)) AS v
        FROM events GROUP BY event_type, day(ts)),
      g AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               COUNT(*) AS n_days,
               CAST(SUM(a.v) AS DOUBLE) AS sx, CAST(SUM(b.v) AS DOUBLE) AS sy,
               CAST(SUM(a.v * b.v) AS DOUBLE) AS sxy,
               CAST(SUM(a.v * a.v) AS DOUBLE) AS sxx,
               CAST(SUM(b.v * b.v) AS DOUBLE) AS syy
        FROM daily a JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type)
      SELECT ta, tb, CAST(n_days AS BIGINT) AS n_days,
             CASE WHEN CAST(n_days AS DOUBLE) * sxx - sx * sx > 0
                   AND CAST(n_days AS DOUBLE) * syy - sy * sy > 0
             THEN CAST(floor(((CAST(n_days AS DOUBLE) * sxy - sx * sy) /
                  (sqrt(CAST(n_days AS DOUBLE) * sxx - sx * sx) *
                   sqrt(CAST(n_days AS DOUBLE) * syy - sy * sy))) * 1000000) AS BIGINT)
             ELSE NULL END AS corr_fp
      FROM g ORDER BY ta, tb""",
    "q142_ab_chisquare" -> """
      WITH pu AS (SELECT DISTINCT user_id, event_type FROM events),
      u AS (SELECT DISTINCT user_id, CAST(user_id % 2 AS INT) AS arm FROM events),
      sizes AS (SELECT SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
                       SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b
                FROM u),
      conv AS (SELECT pu.event_type,
                      SUM(CASE WHEN u.arm = 0 THEN 1 ELSE 0 END) AS conv_a,
                      SUM(CASE WHEN u.arm = 1 THEN 1 ELSE 0 END) AS conv_b
               FROM pu JOIN u USING (user_id) GROUP BY pu.event_type)
      SELECT event_type,
             CAST(conv_a AS BIGINT) AS conv_a, CAST(n_a AS BIGINT) AS n_a,
             CAST(conv_b AS BIGINT) AS conv_b, CAST(n_b AS BIGINT) AS n_b,
             CAST(CASE WHEN
               CAST(n_a + n_b AS HUGEINT) *
               CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS HUGEINT) *
               CAST(conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS HUGEINT) * 1000 >
               3841 * CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) *
               CAST(conv_a + conv_b AS HUGEINT) *
               CAST(n_a + n_b - conv_a - conv_b AS HUGEINT)
             THEN 1 ELSE 0 END AS INT) AS significant,
             CAST(CASE WHEN conv_a * n_b > conv_b * n_a THEN 1
                  WHEN conv_a * n_b < conv_b * n_a THEN -1 ELSE 0 END AS INT) AS direction
      FROM conv, sizes
      ORDER BY event_type""",
    "q138_session_paths" -> """
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
                 FROM events),
      l AS (SELECT *, lag(tus) OVER (PARTITION BY user_id
                                     ORDER BY tus, event_id) AS prev FROM e),
      si AS (SELECT *,
               SUM(CASE WHEN prev IS NULL OR tus - prev > 7200000000 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
             FROM l),
      c AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                         ORDER BY tus, event_id) AS rn FROM si),
      p AS (SELECT user_id, sid,
              string_agg(event_type, '>' ORDER BY tus, event_id) AS path,
              MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
            FROM c WHERE rn <= 8 GROUP BY user_id, sid),
      t AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM p WHERE converted = 1 GROUP BY path),
      r AS (SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rk FROM t)
      SELECT path, n_sessions FROM r WHERE rk <= 10
      ORDER BY n_sessions DESC, path""",
    "q131_linear_attribution" -> """
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
                 FROM events),
      p AS (SELECT user_id, event_id AS p_id, tus AS p_tus
            FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id AS c_user, tus AS c_tus
            FROM e WHERE event_type = 'click'),
      t AS (SELECT p.user_id, p.p_id, COUNT(*) AS n_touch
            FROM p JOIN c ON c.c_user = p.user_id
                         AND c.c_tus <= p.p_tus
                         AND c.c_tus > p.p_tus - CAST(604800000000 AS BIGINT)
            GROUP BY p.user_id, p.p_id),
      cr AS (SELECT user_id, p_id, n_touch,
                    (1000 // n_touch) * n_touch AS credit
             FROM t)
      SELECT p.user_id, COUNT(*) AS n_purchases,
             COUNT(cr.n_touch) AS n_attributed,
             CAST(COALESCE(SUM(cr.credit), 0) AS BIGINT) AS credit_sum
      FROM p LEFT JOIN cr ON cr.user_id = p.user_id AND cr.p_id = p.p_id
      GROUP BY p.user_id ORDER BY p.user_id""",
    "q127_cdc_apply" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type, event_id,
                        CAST(floor(value * 100) AS BIGINT) AS cents
                 FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY tus DESC, event_id DESC) AS rn,
              COUNT(*) OVER (PARTITION BY user_id) AS n_changes
            FROM e)
      SELECT user_id, event_type AS state, cents, tus AS last_tus,
             CAST(n_changes AS BIGINT) AS n_changes
      FROM r WHERE rn = 1 AND event_type <> 'error'
      ORDER BY user_id""",
    "q128_mad_outliers" -> """
      WITH c AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
                 FROM events),
      med AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
              FROM c GROUP BY event_type),
      dev AS (SELECT c.event_type, abs(c.cents - m.med) AS adev, m.med
              FROM c JOIN med m USING (event_type)),
      st AS (SELECT event_type, COUNT(*) AS n, ANY_VALUE(med) AS medv,
                    quantile_cont(adev, 0.5) AS mad
             FROM dev GROUP BY event_type),
      o AS (SELECT d.event_type, COUNT(*) AS n_outliers
            FROM dev d JOIN st USING (event_type)
            WHERE d.adev > st.mad * 5 GROUP BY d.event_type)
      SELECT st.event_type, CAST(st.n AS BIGINT) AS n,
             CAST(st.medv * 2 AS BIGINT) AS med_x2,
             CAST(st.mad * 4 AS BIGINT) AS mad_x4,
             CAST(COALESCE(o.n_outliers, 0) AS BIGINT) AS n_outliers
      FROM st LEFT JOIN o USING (event_type)
      ORDER BY st.event_type""",
    "q125_event_transitions" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type AS src, event_id
                 FROM events),
      p AS (SELECT src, lead(src) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS dst
            FROM e),
      m AS (SELECT src, dst, COUNT(*) AS n FROM p WHERE dst IS NOT NULL GROUP BY src, dst)
      SELECT src, dst, CAST(n AS BIGINT) AS n,
             CAST(n * 1000 // SUM(n) OVER (PARTITION BY src) AS BIGINT) AS p_k
      FROM m ORDER BY src, dst""",
    "q121_scd2_intervals" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type, event_id FROM events),
      m AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
            FROM e),
      g AS (SELECT *, SUM(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY tus, event_id
                    ROWS UNBOUNDED PRECEDING) AS grp
            FROM m),
      iv AS (SELECT user_id, grp, MIN(event_type) AS state,
                    MIN(tus) AS valid_from_us, COUNT(*) AS n_events
             FROM g GROUP BY user_id, grp),
      f AS (SELECT user_id, state, valid_from_us, n_events,
              lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us, state) AS valid_to_us
            FROM iv)
      SELECT user_id, state, valid_from_us, valid_to_us,
             CAST(n_events AS BIGINT) AS n_events,
             CAST(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
      FROM f ORDER BY user_id, valid_from_us, state""",
    "q113_gapfill" -> s"""
      WITH daily AS (SELECT user_id, epoch_us(ts) // $DayUs AS day,
                            SUM(CAST(floor(value*100) AS BIGINT)) AS cents
                     FROM events GROUP BY 1, 2),
      grid AS (SELECT user_id, unnest(generate_series(MIN(day), MAX(day))) AS day
               FROM daily GROUP BY user_id),
      j AS (SELECT g.user_id, g.day, d.cents
            FROM grid g LEFT JOIN daily d USING (user_id, day))
      SELECT user_id, day,
             CAST(last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cents,
             CAST(cents IS NOT NULL AS INT) AS observed
      FROM j ORDER BY user_id, day""",
    "q97_funnel" -> """
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
      t1 AS (SELECT user_id, MIN(tus) AS t1 FROM e WHERE event_type = 'signup' GROUP BY user_id),
      t2 AS (SELECT e.user_id, MIN(tus) AS t2 FROM e JOIN t1 USING (user_id)
             WHERE event_type = 'click' AND tus > t1 GROUP BY e.user_id),
      t3 AS (SELECT e.user_id, MIN(tus) AS t3 FROM e JOIN t2 USING (user_id)
             WHERE event_type = 'purchase' AND tus > t2 GROUP BY e.user_id)
      SELECT 1 AS step, COUNT(*) AS n_users FROM t1
      UNION ALL SELECT 2, COUNT(*) FROM t2
      UNION ALL SELECT 3, COUNT(*) FROM t3
      ORDER BY step""",
    "q98_retention" -> s"""
      WITH uw AS (SELECT DISTINCT user_id, epoch_us(ts) // ${DayUs * 7} AS week FROM events),
      c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id)
      SELECT cohort_week, week - cohort_week AS offset_w, COUNT(*) AS n_users
      FROM uw JOIN c USING (user_id)
      GROUP BY cohort_week, offset_w ORDER BY cohort_week, offset_w""",
    "q99_winsorize" -> """
      WITH e AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
      b AS (SELECT CAST(floor(quantile_cont(cents, 0.05)) AS BIGINT) AS lo,
                   CAST(floor(quantile_cont(cents, 0.95)) AS BIGINT) AS hi FROM e)
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(greatest(lo, least(hi, cents))) AS BIGINT) AS sum_clip,
             CAST((SUM(greatest(lo, least(hi, cents))) * 100) // COUNT(*) AS BIGINT) AS avg_clip_cc
      FROM e, b GROUP BY event_type ORDER BY event_type""",
    "q100_grouping_sets" -> """
      SELECT lang, source,
             CAST(grouping(lang) AS TINYINT) AS g_lang,
             CAST(grouping(source) AS TINYINT) AS g_source,
             count(1) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents
      GROUP BY GROUPING SETS ((lang), (source), ())
      ORDER BY g_lang, g_source, lang NULLS FIRST, source NULLS FIRST""",
    "q101_pivot" -> """
      SELECT source,
             CAST(count(1) FILTER (WHERE lang = 'de') AS BIGINT) AS de,
             CAST(count(1) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
             CAST(count(1) FILTER (WHERE lang = 'es') AS BIGINT) AS es,
             CAST(count(1) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
             CAST(count(1) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh
      FROM documents GROUP BY source ORDER BY source"""
  )
}
