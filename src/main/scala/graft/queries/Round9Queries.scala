package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 additions. q154 is the migration-surface proof: the classic
  * Beam wordcount authored ENTIRELY through the [[graft.dsl.BeamOps]]
  * veneer — a ported `beam.ParDo | beam.WithKeys | beam.CombinePerKey`
  * pipeline, no column forms — put under the same DuckDB hash gate as
  * every column query. Its answer is definitionally q03's (the
  * column-form wordcount), so a green row certifies "a Beam pipeline
  * ported onto the veneer is oracle-identical to the native engine",
  * which is the whole point of the veneer.
  *
  * Scale note carried from BeamOps' scaladoc: the typed veneer runs
  * lambdas outside whole-stage codegen — right for genuinely imperative
  * DoFns, 2-10× slower than the column form for relational shapes
  * (q03 IS the recommended spelling of this query; BeamOpsSpec pins
  * that the veneer still map-side combines, so the SHUFFLE economics
  * match even where the per-row cost doesn't).
  */
object Round9Queries extends QueryPack {

  def q154(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.dsl.BeamOps._
    val docs: Dataset[String] = Tables.documents(s, d).select(col("text")).as[String]
    docs
      .parDo((t: String) => t.split(" ", -1).toSeq)      // beam.FlatMap tokenize
      .withKeys((w: String) => w)                        // beam.WithKeys
      .combinePerKey(0L)((acc, _: String) => acc + 1L,   // beam.combiners.Count
        _ + _)
      .toDF("word", "cnt")
      .orderBy(col("word"))                              // presentation sort (total: word is the group key)
  }

  /** q155: the windowed counterpart of q154 — Beam's
    * `WindowInto(FixedWindows(1 day)) | CombinePerKey` authored through
    * the veneer's [[graft.dsl.BeamOps.PWindowed.windowIntoFixed]] (the
    * window struct joins the grouping key, exactly Beam's model) and
    * put under the DuckDB hash gate. Its answer is definitionally
    * q21's, so a green row certifies the MIGRATION SPELLING of
    * event-time windowing, not just the column form. */
  def q155(s: SparkSession, d: String): DataFrame = {
    import graft.dsl.BeamOps._
    import graft.util.Det._
    Tables.events(s, d)
      .windowIntoFixed("ts", "1 day", col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("w_start_us"), col("event_type"))
  }

  /** q156: Avro sink+source under the oracle — events written through
    * [[graft.sources.AvroIO]] (8 container shards, deterministic sync
    * markers, write-once via [[Round8Queries.ensureScratch]]) and read
    * back with COLUMN PROJECTION pushed into the Avro reader schema
    * (event_id/props are skip-decoded, exercising `ReadFromAvro
    * (columns=...)`), then aggregated per event_type with exact integer
    * checksums: row count, Σ micros-of-day of every timestamp (pins the
    * timestamp-micros logical-type round-trip to the microsecond), Σ
    * user_id, and the house decimal-cents value sum. The oracle
    * computes the same from the ORIGINAL parquet, so a framing, schema
    * -mapping, or projection bug that drops, duplicates, or shifts one
    * record breaks the hash. IoSpec covers the full-schema round-trip
    * (nulls, binary, arrays) and the loud unsupported-type /
    * missing-column failures; this row pins end-to-end data fidelity. */
  def q156(s: SparkSession, d: String): DataFrame = {
    import graft.util.Det._
    val base = Round8Queries.ensureScratch(s, "avro", d) { b =>
      graft.sources.AvroIO.write(
        Tables.events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"), col("props"))
          .repartition(8),
        s"$b/data")
    }
    graft.sources.AvroIO.read(s, s"$base/data",
        columns = Seq("ts", "user_id", "event_type", "value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        // micros-of-day, not raw epoch micros: Σ epoch_us overflows
        // BIGINT by ~20x at sf0.1 row counts (1.8e15 × 1e5 rows); the
        // day-fraction still pins every row's timestamp to the micro
        sum(unix_micros(col("ts")) % lit(86400000000L)).as("ts_day_us_sum"),
        sum(col("user_id")).as("uid_sum"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** q157: CSV sink+source fidelity under the oracle — the q156 pattern
    * applied to the OTHER spec-only text interchange surface. Events
    * are written through the engine's CSV sink (8 shards, header,
    * write-once via [[Round8Queries.ensureScratch]]; timestamps
    * serialized as exact integer micros) and read back with an explicit
    * schema, then aggregated with checksums that pin every fidelity
    * hazard CSV has: row count (framing), Σ micros-of-day (numeric
    * text round-trip), Σ user_id, an md5-prefix checksum over `props`
    * — a JSON string, so EVERY row round-trips through CSV
    * quote-escaping; one mangled quote breaks the hash — and the house
    * decimal-cents value sum (doubles survive via shortest-repr
    * serialization). The oracle computes identical checksums from the
    * ORIGINAL parquet. */
  def q157(s: SparkSession, d: String): DataFrame = {
    import graft.util.Det._
    val base = Round8Queries.ensureScratch(s, "csv", d) { b =>
      Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .repartition(8)
        .write.option("header", "true").csv(s"$b/data")
    }
    s.read.option("header", "true")
      .schema("event_id BIGINT, ts_us BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .csv(s"$base/data")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("ts_us") % lit(86400000000L)).as("ts_day_us_sum"),
        sum(col("user_id")).as("uid_sum"),
        sum(conv(substring(md5(col("props")), 1, 8), 16, 10).cast("long"))
          .as("props_ck"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** q158: JSON-lines sink+source fidelity under the oracle — completes
    * the q156/q157 interchange-format trio. The fidelity hazard JSON
    * adds over CSV is STRING ESCAPING of structured content: `props` is
    * itself a JSON document, so every row round-trips a JSON string
    * embedded in JSON (quote/backslash escaping both directions); the
    * md5-prefix checksum breaks if one escape is mangled. Timestamps
    * travel as exact integer micros and doubles as shortest-repr
    * literals, pinned by the same integer/decimal-cents checksums as
    * q156/q157 against the ORIGINAL parquet. */
  def q158(s: SparkSession, d: String): DataFrame = {
    import graft.util.Det._
    val base = Round8Queries.ensureScratch(s, "json", d) { b =>
      Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .repartition(8)
        .write.json(s"$b/data")
    }
    s.read
      .schema("event_id BIGINT, ts_us BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .json(s"$base/data")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("ts_us") % lit(86400000000L)).as("ts_day_us_sum"),
        sum(col("user_id")).as("uid_sum"),
        sum(conv(substring(md5(col("props")), 1, 8), 16, 10).cast("long"))
          .as("props_ck"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** q159: text-lines sink+source fidelity under the oracle — Beam's
    * founding IO pair (`ReadFromText`/`WriteToText`, the wordcount
    * example's source) promoted from spec-only to the hash gate. The
    * corpus is written as raw lines (write-once, 8 shards) and read
    * back; 16 md5 buckets each carry a row count, a character-length
    * sum, and an md5-prefix checksum, so a dropped, split, or mutated
    * line breaks the hash. The lines format carries a precondition the
    * fixtures satisfy (and the oracle would catch if they stopped to):
    * no embedded newlines. */
  def q159(s: SparkSession, d: String): DataFrame = {
    val base = Round8Queries.ensureScratch(s, "text", d) { b =>
      Tables.documents(s, d).select(col("text")).repartition(8)
        .write.text(s"$b/data")
    }
    s.read.text(s"$base/data")
      .select(col("value").as("text"))
      .groupBy(substring(md5(col("text")), 1, 1).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("text"))).cast("long").as("len_sum"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("text_ck"))
      .orderBy(col("bucket"))
  }

  /** q160: deterministic epoch shuffle — the seeded global permutation
    * + shard manifest an LLM training pipeline needs for REPRODUCIBLE
    * batch order (re-running the pipeline must yield byte-identical
    * shard contents in byte-identical order; a new epoch is a new seed
    * string, nothing re-read). Permutation = order by
    * md5(doc_id ":" seed) — doc_id is unique so the order is total;
    * shard = leading key byte mod 8, so shard membership and
    * within-shard position both derive from the key alone. The oracle
    * row pins ORDER, not just membership: each shard's checksum is
    * Σ rank×(doc_id mod 9973) over the within-shard rank, which any
    * swap, drop, or duplication perturbs.
    *
    * Scale shape: hash-then-sort is the standard distributed shuffle —
    * shard count (thousands at 100 TB) sets the parallelism, each
    * shard sorts independently (the window partitions by shard), and
    * the manifest the trainer's loader consumes is |shards| rows. No
    * global sort, no driver materialization. */
  def q160(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":epoch0"))).as("k"))
      .withColumn("shard",
        (conv(substring(col("k"), 1, 2), 16, 10).cast("long") % 8).cast("int"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("k"))))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("first_key"),
        sum(col("rank") * (col("doc_id") % 9973)).cast("long").as("order_ck"))
      .orderBy(col("shard"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_beam_wordcount" -> q154 _,
    "q155_beam_windowed"  -> q155 _,
    "q156_avro_io"        -> q156 _,
    "q157_csv_io"         -> q157 _,
    "q158_json_io"        -> q158 _,
    "q159_text_io"        -> q159 _,
    "q160_epoch_shuffle"  -> q160 _
  )

  override val oracle: Map[String, String] = Map(
    "q154_beam_wordcount" -> """
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word ORDER BY word""",
    "q155_beam_windowed" -> """
      SELECT epoch_us(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS w_start_us,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q156_avro_io" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000) AS BIGINT) AS ts_day_us_sum,
             CAST(SUM(user_id) AS BIGINT) AS uid_sum,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q157_csv_io" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000) AS BIGINT) AS ts_day_us_sum,
             CAST(SUM(user_id) AS BIGINT) AS uid_sum,
             CAST(SUM(CAST(('0x' || substr(md5(props), 1, 8)) AS BIGINT)) AS BIGINT) AS props_ck,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q158_json_io" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000) AS BIGINT) AS ts_day_us_sum,
             CAST(SUM(user_id) AS BIGINT) AS uid_sum,
             CAST(SUM(CAST(('0x' || substr(md5(props), 1, 8)) AS BIGINT)) AS BIGINT) AS props_ck,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q159_text_io" -> """
      SELECT substr(md5(text), 1, 1) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(length(text)) AS BIGINT) AS len_sum,
             CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT) AS text_ck
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q160_epoch_shuffle" -> """
      WITH k AS (SELECT doc_id, md5(doc_id || ':epoch0') AS k FROM documents),
      s AS (SELECT doc_id, k,
              CAST(('0x' || substr(k, 1, 2)) AS BIGINT) % 8 AS shard FROM k),
      r AS (SELECT shard, k, doc_id,
              row_number() OVER (PARTITION BY shard ORDER BY k) AS rank FROM s)
      SELECT CAST(shard AS INT) AS shard, CAST(COUNT(*) AS BIGINT) AS n,
             min(k) AS first_key,
             CAST(SUM(rank * (doc_id % 9973)) AS BIGINT) AS order_ck
      FROM r GROUP BY shard ORDER BY shard"""
  )
}
