package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-15 additions: typed PII redaction with per-class audit counts
  * (q181 — the q96 digit-run redactor extended to the classes a
  * takedown/compliance pass actually ships: email, URL, phone) and
  * corpus-wide tokenizer application (q182 — the trained q179 merges
  * applied per document via the broadcast word→tokens join, the
  * 100 TB apply shape q180's scale note promises).
  */
object Round15Queries extends QueryPack {

  // q181: typed PII redaction -------------------------------------------

  /** The four redaction classes, applied in cascade order (URL first —
    * a URL may embed an email-shaped userinfo or digit runs; email
    * before phone/number for the same containment reason; the bare
    * digit-run class last catches whatever typed classes left behind).
    * Patterns are RE2/Java-portable: character classes, bounded
    * repetition, no backreferences or lookaround — Spark (java.util
    * .regex) and DuckDB (RE2) match identically. */
  private[graft] val PiiClasses: Seq[(String, String, String)] = Seq(
    ("n_url", "https?://[^ ]+", "<URL>"),
    ("n_email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_phone", "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}", "<PHONE>"),
    ("n_num", "[0-9]+", "#"))

  /** q181: typed PII redaction over a rendered document — each fixture
    * doc is extended with a deterministic contact block (email, phone,
    * URL, numeric ref derived from doc_id by integer arithmetic — the
    * fixtures carry no PII, so the query renders the PII-bearing page
    * a crawl snapshot would contain, identically on both engines),
    * then the cascade strips each class and audits how many spans it
    * removed. Emits the redacted text plus the per-class counts — the
    * audit record a compliance pass must produce alongside the
    * rewrite.
    *
    * Scale shape: one narrow projection pass, zero shuffle before the
    * presentation sort — each row's work is four regex passes over its
    * own text, embarrassingly parallel at any corpus size; counts are
    * computed on the SAME intermediate strings the cascade rewrites,
    * so audit and rewrite cannot drift. */
  def q181(s: SparkSession, d: String): DataFrame = {
    val k = col("doc_id")
    def istr(c: Column): Column = c.cast("string")
    val contact = concat(
      lit(" contact u"), istr(k), lit("@mail-"), istr(pmod(k, lit(7L))),
      lit(".example.com or +1-"),
      istr(pmod(k * 7, lit(900L)) + 100), lit("-"),
      lpad(istr(pmod(k * 13, lit(1000L))), 3, "0"), lit("-"),
      lpad(istr(pmod(k * 29, lit(10000L))), 4, "0"),
      // one contiguous literal: example.org is RFC-2606 reserved and on
      // the leak linter's allowlist (round-16 ADVICE — never structure
      // source so the scanner can't see a URL it constructs); the
      // per-doc variation lives in the PATH so the host stays the bare
      // reserved domain
      lit(" see https://example.org/ex-"), istr(pmod(k, lit(5L))),
      lit("/u/"), istr(k),
      lit(" ref "), istr(k * 3))
    val rendered = Tables.documents(s, d)
      .select(col("doc_id"), concat(col("text"), contact).as("t0"))
    // fold the cascade: count class i on t(i-1), then rewrite to t(i)
    val (redacted, counts) =
      PiiClasses.zipWithIndex.foldLeft((rendered, Seq.empty[Column])) {
        case ((df, cs), ((name, pat, rep), i)) =>
          val prev = if (i == 0) "t0" else s"t$i"
          val next = s"t${i + 1}"
          (df.withColumn(name,
              size(regexp_extract_all(col(prev), lit(pat), lit(0)))
                .cast("long"))
            .withColumn(next, regexp_replace(col(prev), lit(pat), lit(rep))),
            cs :+ col(name))
      }
    redacted
      .select(Seq(col("doc_id"),
        col(s"t${PiiClasses.size}").as("red")) ++ counts: _*)
      .orderBy(col("doc_id"))
  }

  // q182: tokenizer application at corpus scale ---------------------------

  /** q182: the trained tokenizer APPLIED per document — the broadcast
    * shape q180's scale note promises, demonstrated rather than
    * described: the Heaps'-small (word → token-count) table from the
    * q179 training loop's final segmentation broadcasts onto the
    * exploded token stream, and each document folds to its token
    * count plus an integer chars-per-token compression ratio (the
    * statistic a data pipeline uses to budget context windows and
    * detect tokenizer-hostile documents). One corpus pass, one
    * broadcast join, one doc-keyed aggregation — at 100 TB the vocab
    * side stays dimension-sized by Heaps' law, so the stream side
    * never shuffles anything wider than (doc_id, small ints).
    * Deterministic integers throughout; the oracle replays the same
    * 8-round CTE chain and joins v8. */
  /** Per-document token statistics under the trained q179 tokenizer —
    * the (doc_id, n_words, n_tokens, n_chars) core shared by q182 (the
    * per-doc emit) and q184 (the per-language fertility rollup). */
  private[queries] def docTokenStats(s: SparkSession, d: String): DataFrame = {
    val (_, vocab) = Round14Queries.bpeTrain(s, d)
    val wordToks = vocab.select(col("w"),
      size(split(trim(col("s"), "|"), "\\|\\|")).cast("long").as("toks"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.TextOps.words(col("text"))).as("w"))
      .join(broadcast(wordToks), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("toks")).as("n_tokens"),
        sum(length(col("w")).cast("long")).as("n_chars"))
  }

  def q182(s: SparkSession, d: String): DataFrame =
    docTokenStats(s, d)
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        expr("CAST((n_chars * 10000L) DIV n_tokens AS BIGINT)")
          .as("chars_per_token_bp"))
      .orderBy(col("doc_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_pii_redact" -> q181 _,
    "q182_tokenize_corpus" -> q182 _
  )

  def oracle: Map[String, String] = {
    val contact =
      """' contact u' || doc_id || '@mail-' || (doc_id % 7) ||
        '.example.com or +1-' || ((doc_id * 7) % 900 + 100) || '-' ||
        lpad(CAST((doc_id * 13) % 1000 AS VARCHAR), 3, '0') || '-' ||
        lpad(CAST((doc_id * 29) % 10000 AS VARCHAR), 4, '0') ||
        ' see https://example.org/ex-' || (doc_id % 5) || '/u/' || doc_id ||
        ' ref ' || (doc_id * 3)"""
    // one CTE per cascade stage: select doc_id, every prior class's
    // count, this stage's count on the incoming text, the rewrite
    val chain = PiiClasses.zipWithIndex.map { case ((name, pat, rep), i) =>
      val prior = PiiClasses.take(i).map(_._1)
      s"""s${i + 1} AS (SELECT doc_id${prior.map(", " + _).mkString},
               CAST(len(regexp_extract_all(t, '$pat')) AS BIGINT) AS $name,
               regexp_replace(t, '$pat', '$rep', 'g') AS t
             FROM s$i)"""
    }.mkString(",\n      ")
    Map(
      "q181_pii_redact" -> s"""
      WITH s0 AS (SELECT doc_id, text || $contact AS t FROM documents),
      $chain
      SELECT doc_id, t AS red, ${PiiClasses.map(_._1).mkString(", ")}
      FROM s${PiiClasses.size} ORDER BY doc_id""",
      // the q179/q180 training chain replayed, its final segmentation
      // (v8) collapsed to the word -> token-count table, joined back
      // onto the exploded corpus
      "q182_tokenize_corpus" -> s"""
      ${Round14Queries.bpeBaseSql},
      wt AS (SELECT w,
                    CAST(len(string_split(trim(s, '|'), '||')) AS BIGINT) AS toks
             FROM v${Round14Queries.BpeRounds})
      SELECT u.doc_id, COUNT(*) AS n_words,
             CAST(SUM(wt.toks) AS BIGINT) AS n_tokens,
             CAST((SUM(len(u.w)) * 10000) // SUM(wt.toks) AS BIGINT)
               AS chars_per_token_bp
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents) u
      JOIN wt USING (w)
      GROUP BY u.doc_id ORDER BY u.doc_id""")
  }
}
