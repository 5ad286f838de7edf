package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Det._

/** Event-time windowing in batch (SURVEY.md §2.9) — Beam's
  * WindowInto(FixedWindows/SlidingWindows/Sessions) re-expressed with
  * Spark's window()/session_window() grouping columns over the `events`
  * table. The same plans run unchanged under Structured Streaming (the
  * streaming mirror + watermark lives in graft.streaming; batch here is
  * the oracle-checkable face).
  *
  * Determinism: window bounds are emitted as epoch microseconds
  * (unix_micros) — the fixture `ts` is ns-precision parquet which Spark
  * floors to µs on read (Tables.events) and DuckDB floors on CAST, so µs
  * integers are the common exact currency. Value sums go through decimal
  * (graft.util.Det).
  *
  * Scale: each query is scan → hash-agg with map-side partial combine on
  * (window, key); no joins, no windows-over-unbounded-frames. Sliding
  * windows fan each row out ×(size/slide) before the partial agg — at
  * 100 TB keep size/slide small (here 2) or pre-bucket to the slide
  * granularity and roll up.
  */
object WindowQueries extends QueryPack {

  /** Tumbling 1-day windows per event_type (FixedWindows). */
  def q21(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("w_start_us"), col("event_type"))

  /** Sliding 2-day windows advancing 1 day (SlidingWindows): every event
    * lands in exactly 2 windows. */
  def q22(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("n"), col("sum_value"))
      .orderBy(col("w_start_us"))

  /** Session windows per user, 12-hour gap (Sessions). Spark merges an
    * event into the open session iff ts < last_ts + gap (strict), so the
    * oracle's gaps-and-islands breaks on diff >= gap. */
  def q23(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "12 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("s_start_us"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("s_start_us"))

  /** Dynamic-gap session windows (Beam's Sessions with a per-element
    * gap has no direct Beam-Python surface, but Spark's session_window
    * accepts a gap EXPRESSION — a purchase holds the session open for
    * 24 h, anything else 12 h). The batch oracle generalizes q23's
    * gaps-and-islands: with per-event gaps the session end is the
    * RUNNING MAX of ts+gap (not last ts + constant), so the island
    * break tests against that running max; Spark's merge rule is
    * "event joins the session iff ts < current end" ([start, end)
    * half-open), hence the break on tus >= runmax. */
  def q102(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"),
          when(col("event_type") === "purchase", lit("24 hours"))
            .otherwise(lit("12 hours"))).as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("s_start_us"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("s_start_us"))

  /** Hour-of-day profile (event-time scalar extraction). */
  def q24(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(hour(col("ts")).as("hod"), col("event_type"))
      .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
      .orderBy(col("hod"), col("event_type"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_window_tumbling" -> q21 _,
    "q22_window_sliding"  -> q22 _,
    "q23_window_session"  -> q23 _,
    "q24_hour_profile"    -> q24 _,
    "q102_dynamic_session" -> q102 _
  )

  override val oracle: Map[String, String] = Map(
    "q21_window_tumbling" -> """
      SELECT epoch_us(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS w_start_us,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q22_window_sliding" -> """
      SELECT w_start_us, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM (SELECT epoch_us(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP))
                     - o * 86400000000 AS w_start_us,
                   value
            FROM events, (SELECT unnest([0, 1]) AS o) offs)
      GROUP BY 1 ORDER BY 1""",
    "q23_window_session" -> """
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, event_id, value
                 FROM events),
      m AS (SELECT *, CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
                               >= 43200000000 THEN 1 ELSE 0 END AS brk FROM e),
      s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      SELECT user_id, MIN(tus) AS s_start_us, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM s GROUP BY user_id, sid ORDER BY user_id, s_start_us""",
    "q24_hour_profile" -> """
      SELECT date_part('hour', CAST(ts AS TIMESTAMP)) AS hod, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q102_dynamic_session" -> """
      WITH e AS (SELECT user_id, event_id, value,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                        CASE WHEN event_type = 'purchase'
                             THEN 86400000000 ELSE 43200000000 END AS gap
                 FROM events),
      m AS (SELECT *, MAX(tus + gap) OVER (PARTITION BY user_id
                        ORDER BY tus, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
            FROM e),
      b AS (SELECT *, CASE WHEN runmax IS NOT NULL AND tus >= runmax
                           THEN 1 ELSE 0 END AS brk FROM m),
      s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid FROM b)
      SELECT user_id, MIN(tus) AS s_start_us, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM s GROUP BY user_id, sid ORDER BY user_id, s_start_us"""
  )
}
