package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{Packing, TextOps}

/** Round-3 training-data pipeline operators: runtime join prefiltering,
  * benchmark decontamination, sequence packing, window analytics,
  * stratified corpus mixing, repetition scoring.
  *
  * 100 TB design notes:
  *  - q69's bloom prefilter is THE mechanism for a selective fact-dim
  *    semi join at scale: a 4 KiB broadcast drops non-matching fact rows
  *    inside the scan's codegen stage, before any exchange; the exact
  *    semi join afterwards only sees survivors, so false positives cost
  *    shuffle bytes, never correctness.
  *  - q70 broadcasts the benchmark shingle set (distinct n-grams of the
  *    held-out benchmark — small by construction); the corpus side
  *    explodes shingles but never shuffles them (the aggregation groups
  *    back on doc_id partial-first).
  *  - q71 packs with one hash shuffle + in-partition sort and O(1)
  *    task state (functions/Packing).
  *  - q72 windows shuffle once on user_id and evaluate all four
  *    analytics in the two sort orders that shuffle provides.
  *  - q73/q74 are pure per-row maps over a pruned scan — no shuffle
  *    until the output ORDER BY.
  */
object PipelineQueries extends QueryPack {

  import TextOps._

  // q69: bloom-prefiltered semi join --------------------------------------

  def q69(s: SparkSession, d: String): DataFrame = {
    graft.GraftFunctions.ensure(s)
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // The filter is built in its own (tiny) job and injected as a 4 KiB
    // BINARY LITERAL — the same two-phase shape engine-native runtime
    // filters use. Keeping it lazy as a 1-row cross join instead lets
    // Catalyst reorder the joins and evaluate the exact semi join
    // FIRST, which defeats the prefilter (observed: the plan became
    // semi-join → cross-join → filter). As a literal the predicate
    // pushes into the fact scan's codegen stage, below the join.
    val bf = cust.agg(call_function("bloom_agg", col("c_custkey")).as("bf"))
      .head().getAs[Array[Byte]](0)
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .filter(call_function("bloom_might_contain", lit(bf), col("o_custkey")))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  // q70: benchmark contamination (shared 3-gram ratio vs held-out set) ----

  def q70(s: SparkSession, d: String): DataFrame = {
    graft.GraftFunctions.ensure(s)
    // shingle sets computed once for both the benchmark and corpus sides
    val shs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        array_distinct(call_function("shingles3", words(col("text")))).as("shs"))
      .filter(size(col("shs")) > 0)
      .persist()
    val bench = shs.filter(col("source") === "src0")
      .select(explode(col("shs")).as("sh")).distinct()
    val corpus = shs.filter(col("source") =!= "src0")
      .select(col("doc_id"), explode(col("shs")).as("sh"))
    corpus.join(broadcast(bench.withColumn("hit", lit(1))), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_shared"))
      .withColumn("contam_bp", expr("CAST((n_shared * 10000L) DIV n_shingles AS BIGINT)"))
      .orderBy(col("doc_id"))
  }

  // q71: greedy sequence packing per source (256-token bins) --------------

  val PackBudget = 256L

  def q71(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"))
    Packing.packBySource(docs, PackBudget).toDF()
      .select(col("source"), col("bin_id"), col("doc_id"), col("n_tokens"))
      .orderBy(col("source"), col("bin_id"), col("doc_id"))
  }

  // q72: window-analytics family over the event stream --------------------

  def q72(s: SparkSession, d: String): DataFrame = {
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val wVal = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
    Tables.events(s, d).select(col("event_id"), col("user_id"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(wSeq))
      .withColumn("next_value", lead(col("value"), 1).over(wSeq))
      // percent_rank = (rank-1)/(n-1): both engines build the identical
      // double from small-int division, so floor·1e4 is exact
      .withColumn("pr_bp", floor(percent_rank().over(wVal) * 10000).cast("long"))
      .withColumn("quartile", ntile(4).over(wVal))
      .orderBy(col("event_id"))
  }

  // q73: stratified corpus mixing (deterministic per-language rates) ------

  /** Down-sample English to 30% and everything else to 80% — the
    * data-mixing step that rebalances a raw crawl toward a target
    * language distribution. Membership is a pure hash of doc_id, so the
    * sample is reproducible, join-free, and identical in both engines. */
  def q73(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 10000)
      .withColumn("rate", when(col("lang") === "en", lit(3000L)).otherwise(lit(8000L)))
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  // q74: intra-document repetition score (duplicate 3-gram ratio) ---------

  def q74(s: SparkSession, d: String): DataFrame = {
    graft.GraftFunctions.ensure(s)
    Tables.documents(s, d)
      .select(col("doc_id"), call_function("shingles3", words(col("text"))).as("tri"))
      .filter(size(col("tri")) > 0)
      .select(col("doc_id"),
        size(col("tri")).cast("long").as("n_tri"),
        size(array_distinct(col("tri"))).cast("long").as("n_uniq"))
      .withColumn("rep_bp", expr("CAST(((n_tri - n_uniq) * 10000L) DIV n_tri AS BIGINT)"))
      .orderBy(col("doc_id"))
  }

  // q75: equi-depth histogram (decile buckets of l_extendedprice) --------

  /** Global equi-depth bucketing, the way Spark's own RangePartitioner
    * does it: boundaries from an exact percentile over a DETERMINISTIC
    * HASH SAMPLE (5%, Knuth multiplicative hash of the integer row key
    * — identical row set in both engines, and integer-cheap where the
    * md5 membership of q73/q79 costs a digest per row; estimation
    * tolerates the weaker hash, reproducible MEMBERSHIP does not),
    * collected as 9 literal doubles; assignment is a per-row
    * codegen'd comparison chain, with the boundary nudged by 1e-3:
    * Spark `percentile` and DuckDB `quantile_cont` interpolate with
    * different operation order, so an interpolated boundary can land
    * 1 ULP apart across engines — found at sf1, where a data value sat
    * exactly on a boundary and bucketed differently. The nudge is
    * harmless (data granularity 0.01 >> 1e-3 >> ULP jitter) and makes
    * assignment engine-stable. Exact `percentile` buffers
    * every input value in one aggregation buffer — fine over a bounded
    * sample, a scale-killer over the full column (measured 2.6 s at
    * sf0.1 vs 0.6 s sampled; at 100 TB, shrink the rate or swap in
    * mergeable `approx_percentile`, trading the oracle's exactness).
    * Spark `percentile` interpolates identically to DuckDB
    * `quantile_cont`, so sampled boundaries still hash-match. */
  val SampleBp = 500L

  /** 5% deterministic row sample: Knuth multiplicative hash over the
    * (orderkey, linenumber) row key — pure 64-bit int math, identical
    * in Spark and DuckDB. The key folds through mod 1e9+7 BEFORE the
    * multiply so the product is bounded at ~2.65e18 < 2^63-1 for ANY
    * key domain: the round-15 sf10 sweep caught the unfolded form
    * overflowing (offset-scaled orderkeys reach ~9.9e9 there, and
    * 9.9e9 * 2654435761 > 2^63 — an ANSI ARITHMETIC_OVERFLOW in Spark,
    * silent wraparound elsewhere). Both engines fold identically, so
    * the sampled row set still hash-matches. */
  private def rowSample(ok: org.apache.spark.sql.Column, ln: org.apache.spark.sql.Column) =
    ((ok % lit(1000000007L)) * lit(2654435761L) + ln * lit(40503L)) % 10000 < lit(SampleBp)

  private def rowSampleSql = // the oracle twin
    s"((l_orderkey % 1000000007) * 2654435761 + l_linenumber * 40503) % 10000 < $SampleBp"

  def q75(s: SparkSession, d: String): DataFrame = {
    val pcts = (1 to 9).map(_ / 10.0).mkString("array(", ", ", ")")
    val bnds: Seq[Double] = Tables.lineitem(s, d)
      .filter(rowSample(col("l_orderkey"), col("l_linenumber")))
      .agg(expr(s"percentile(l_extendedprice, $pcts)").as("bnds"))
      .head().getSeq[Double](0)
    // 9 boundary doubles become literal comparisons — a codegen'd
    // branch-free sum, not an interpreted higher-order filter over an
    // array column (measured 2x on the assignment pass); +1e-3 per the
    // cross-engine ULP note above
    val bucket = bnds.map(b => when(col("x") > lit(b + 1e-3), 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)
    Tables.lineitem(s, d).select(col("l_extendedprice").as("x"))
      .withColumn("bucket", bucket.cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("min_price"), max(col("x")).as("max_price"))
      .orderBy(col("bucket"))
  }

  // q76: exact distributed Pearson correlation per return flag -----------

  /** corr(l_quantity, l_extendedprice) per flag WITHOUT the built-in
    * `corr` aggregate: the built-in accumulates doubles in partition
    * order, so its last bits are nondeterministic under parallelism.
    * Here the five moment sums run in exact DECIMAL (order-independent,
    * mergeable — the same trick as util.Det), and only the final
    * per-group scalar formula drops to doubles, identically in both
    * engines; floor·1e6 fixed-points the result. */
  def q76(s: SparkSession, d: String): DataFrame = {
    import graft.util.Det.dec2
    val x = dec2(col("l_quantity"))
    val y = dec2(col("l_extendedprice"))
    val g = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
    val nD = col("n").cast("double")
    val corr = (nD * col("sxy") - col("sx") * col("sy")) /
      (sqrt(nD * col("sxx") - col("sx") * col("sx")) *
       sqrt(nD * col("syy") - col("sy") * col("sy")))
    g.select(col("l_returnflag"), col("n"),
        floor(corr * 1e6).cast("long").as("corr_fp"))
      .orderBy(col("l_returnflag"))
  }

  // q77: text normalization (stopword strip + renormalized join) ---------

  private val stopWords = Seq("the", "a", "of")

  /** The cleaning map step of corpus prep: strip stopwords, re-join,
    * emit the normalized-text digest plus before/after token counts.
    * Pure per-row array expressions over a pruned scan — no shuffle at
    * all until the output ORDER BY; at 100 TB this runs at scan speed
    * and the md5 keeps the verified output narrow (the real pipeline
    * would write the normalized text itself). */
  def q77(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .withColumn("kept", filter(col("ws"), w => !w.isInCollection(stopWords)))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(col("kept")).cast("long").as("n_kept"),
        md5(array_join(col("kept"), " ")).as("norm_md5"))
      .orderBy(col("doc_id"))

  // q79: stratified train/val/test split ----------------------------------

  /** Deterministic 80/10/10 corpus split (hash of doc_id, the same
    * reproducible-membership trick as q73), reported per (lang, split)
    * with token mass — the integrity check run before any training job.
    * Join-free: membership is a pure row expression, the only shuffle
    * is the final tiny aggregation. */
  def q79(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 10000)
      .withColumn("split",
        when(col("bucket") < 8000, lit("train"))
          .when(col("bucket") < 9000, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(words(col("text"))).cast("long")).as("sum_tokens"))
      .orderBy(col("lang"), col("split"))

  // q80: vocabulary build with dense ids + cumulative coverage -----------

  /** Tokenizer-prep vocabulary: words ranked by corpus frequency with
    * dense ids and cumulative-coverage basis points. The corpus-scale
    * work is one explode + partial-first count; the ranking windows run
    * over the AGGREGATED vocabulary (Heaps'-law small), so the
    * single-partition global window is a non-issue at any corpus
    * size — it never sees raw tokens. */
  def q80(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(explode(words(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val wRank = Window.orderBy(col("cnt").desc, col("word"))
    counts
      .withColumn("vocab_id", row_number().over(wRank).cast("long"))
      .withColumn("cum", sum(col("cnt")).over(
        wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("vocab_id"), col("word"), col("cnt"),
        expr("CAST((cum * 10000L) DIV total AS BIGINT)").as("cum_bp"))
      .orderBy(col("vocab_id"))
  }

  // q81: Z-order layout rewrite stats -------------------------------------

  /** Multi-dimensional data layout: cut lineitem into 16 "files" along
    * the native `zorder_key` (Morton interleave of partkey/suppkey low
    * bits, graft.expressions.ZorderKey) and emit each file's row count
    * and min/max of BOTH keys — the file-skipping stats a scan would
    * consult after a Delta/Iceberg-style OPTIMIZE ZORDER rewrite.
    * File boundaries come the way RangePartitioner gets them — exact
    * percentiles over a deterministic 5% hash sample (q75's pattern),
    * collected as 15 literal doubles — and assignment is a per-row
    * comparison chain, so the plan is sample-agg + narrow map + 16-group agg: no
    * global window, no single-partition sort, nothing that breaks at
    * 100 TB. (A global-ntile cut would be exact equal-height but moves
    * the whole table to one partition — the first version did, and the
    * WindowExec warning is why it's gone.) */
  def q81(s: SparkSession, d: String): DataFrame = {
    graft.GraftFunctions.ensure(s)
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .withColumn("z",
        call_function("zorder_key", col("l_partkey"), col("l_suppkey")).cast("double"))
    val pcts = (1 to 15).map(i => i / 16.0).mkString("array(", ", ", ")")
    val bnds: Seq[Double] = li
      .filter(rowSample(col("l_orderkey"), col("l_linenumber")))
      .agg(expr(s"percentile(z, $pcts)").as("bnds"))
      .head().getSeq[Double](0)
    // +1e-3: same cross-engine boundary-ULP guard as q75 (z is integer-
    // valued, spacing 1 >> 1e-3 >> double ULP while z < ~2^42, i.e.
    // keys < ~2^21 — holds through sf10-class partkeys)
    val fileId = bnds.map(b => when(col("z") > lit(b + 1e-3), 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)
    li.withColumn("file_id", fileId.cast("long"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
      .orderBy(col("file_id"))
  }

  // q82: top-10 trigrams per language --------------------------------------

  /** Corpus n-gram statistics (the profile behind contamination checks,
    * repetition analysis, and n-gram LM baselines): explode 3-gram
    * shingles, count per (lang, trigram), WindowGroupLimit top-10 per
    * language. The shuffle key is (lang, trigram) with map-side partial
    * aggregation, so the exchange carries n-gram counts, never raw
    * text. */
  def q82(s: SparkSession, d: String): DataFrame = {
    graft.GraftFunctions.ensure(s)
    val wRank = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("tri"))
    Tables.documents(s, d)
      .select(col("lang"), explode(call_function("shingles3", words(col("text")))).as("tri"))
      .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .filter(col("rk") <= 10)
      .orderBy(col("lang"), col("rk"))
  }

  // q83: quality-weighted sampling ----------------------------------------

  /** Data selection with probability PROPORTIONAL TO QUALITY (the
    * soft version of a hard quality cutoff): a doc survives iff its
    * hash bucket falls below its own quality score in basis points, so
    * a 9 000 bp doc keeps 90% odds and a 2 000 bp doc 20%. Same
    * join-free deterministic-membership shape as q73/q79 — the rate is
    * just data-dependent. */
  def q83(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), words(col("text")).as("ws"))
      .select(col("doc_id"), col("lang"),
        size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        size(filter(col("ws"), w => w.isInCollection(stopWords))).as("n_stop"))
      .withColumn("quality_bp",
        expr("CAST((CAST(n_distinct AS BIGINT) * (n_words - n_stop) * 10000L) " +
          "DIV (CAST(n_words AS BIGINT) * n_words) AS BIGINT)"))
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 10000)
      .filter(col("bucket") < col("quality_bp"))
      .select(col("doc_id"), col("lang"), col("quality_bp"))
      .orderBy(col("doc_id"))

  // q84: per-source quota capping -----------------------------------------

  val SourceQuota = 20L

  /** Cap any single source's contribution to the corpus mix (the
    * anti-domination guard of corpus assembly): within each source,
    * docs are ranked by a hash of their id — an unbiased deterministic
    * shuffle, NOT doc_id order, which would favor old documents — and
    * only the first `SourceQuota` survive. WindowGroupLimit prunes
    * per-partition before the shuffle, so the exchange carries at most
    * quota rows per source per partition. */
  def q84(s: SparkSession, d: String): DataFrame = {
    val wQ = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"))
      .withColumn("rk", row_number().over(wQ).cast("long"))
      .filter(col("rk") <= SourceQuota)
      .orderBy(col("source"), col("rk"))
  }

  // q133: content-defined chunking ----------------------------------------

  /** Rabin-style content-defined chunking, the storage-dedup primitive
    * (LBFS/restic lineage): a chunk boundary falls BEFORE word i
    * whenever the rolling hash of the local 2-gram (w_{i-1}, w_i) is
    * ≡ 0 mod 8 — so boundaries depend only on LOCAL content, and an
    * insertion early in a document shifts chunk digests O(1) chunks
    * downstream instead of re-digesting every fixed-width block (q67's
    * failure mode for storage dedup). Output: one row per chunk with
    * its md5 digest — downstream, identical chunks across documents
    * dedup by digest exactly like q122's paragraphs.
    *
    * Scale shape: boundary detection, chunk assembly, and digesting are
    * ONE generator expression per row — zero shuffles, zero joins; the
    * only wide stage is whatever the caller aggregates digests with.
    * The md5-derived hash is the house portability rule (identical in
    * DuckDB), mod 8 ≈ 8-word expected chunks at fixture scale. */
  def q133(s: SparkSession, d: String): DataFrame = {
    // ONE fused native loop per document (expressions/CdcWordChunks):
    // boundary 2-gram hashes, chunk assembly, and chunk digests share
    // the per-word UTF-8 bytes instead of re-evaluating an interpreted
    // md5→substring→conv tree per 2-gram plus a slice+concat_ws+md5
    // tree per chunk (~6M interpreted evals per sf0.1 pass).
    // ExpressionSpec pins bit-equality against the HOF formulation.
    graft.GraftFunctions.ensure(s)
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(call_function("cdc_word_chunks",
          TextOps.words(col("text")), lit(8))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.n_words"), col("c.digest"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  // q136: small-file compaction planner ------------------------------------

  /** The OPTIMIZE/compaction primitive every long-lived 100 TB table
    * needs: plan which small files merge into which target-sized
    * output bins. Files are simulated from the fixture (one "file" per
    * 32-doc run per source, bytes = Σ n_chars); within each source,
    * files are laid out in file-id order and cut into bins by
    * CUMULATIVE size — bin = (cumsum − bytes) DIV target — so every
    * bin except the last holds ≥ target bytes once it closes, files
    * never split, and the assignment is a pure prefix-sum (the same
    * gaps-free binning DIV trick as q71's oracle, but metadata-sized).
    *
    * Scale shape: a compaction planner reads FILE METADATA, not data —
    * the window runs over |files| rows (already thousands-fold smaller
    * than the corpus; at 100 TB this is the manifest listing). The
    * doc→file aggregation below is the only corpus-sized pass and
    * map-combines. */
  def q136(s: SparkSession, d: String): DataFrame = {
    val Target = 4096L
    val files = Tables.documents(s, d)
      .groupBy(col("source"), expr("doc_id DIV 32").as("file_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
    val w = Window.partitionBy(col("source")).orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("bin", expr(s"(cum - bytes) DIV ${Target}L"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
        min(col("file_id")).as("first_file"), max(col("file_id")).as("last_file"))
      .orderBy(col("source"), col("bin"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_compaction_plan" -> q136 _,
    "q133_cdc_chunking"    -> q133 _,
    "q69_bloom_semijoin"   -> q69 _,
    "q70_contamination"    -> q70 _,
    "q71_seq_pack"         -> q71 _,
    "q72_window_analytics" -> q72 _,
    "q73_stratified_mix"   -> q73 _,
    "q74_repetition"       -> q74 _,
    "q75_equidepth_hist"   -> q75 _,
    "q76_corr_exact"       -> q76 _,
    "q77_normalize"        -> q77 _,
    "q79_split_report"     -> q79 _,
    "q80_vocab"            -> q80 _,
    "q81_zorder_layout"    -> q81 _,
    "q82_trigram_topk"     -> q82 _,
    "q83_weighted_sample"  -> q83 _,
    "q84_source_quota"     -> q84 _
  )

  /** Unrolled Morton interleave of the low 31 bits of two BIGINT
    * columns — the oracle twin of graft.expressions.ZorderKey (disjoint
    * bit positions, so + is carry-free bitwise or). */
  private def zorderSql(x: String, y: String): String =
    (0 until 31).map(i =>
      s"((((($x & 2147483647) >> $i) & 1) << ${2 * i}) + (((($y & 2147483647) >> $i) & 1) << ${2 * i + 1}))")
      .mkString("(", " + ", ")")

  private val shingleList =
    "[array_to_string(words[i:i+2], ' ') for i in generate_series(1, greatest(len(words)-2, 0))]"

  override val oracle: Map[String, String] = Map(
    "q69_bloom_semijoin" -> """
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      ORDER BY o_orderkey""",
    "q70_contamination" -> s"""
      WITH docs AS (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
      shs AS (SELECT doc_id, source, list_distinct($shingleList) AS sh FROM docs),
      ok AS (SELECT * FROM shs WHERE len(sh) > 0),
      bench AS (SELECT DISTINCT unnest(sh) AS s FROM ok WHERE source = 'src0'),
      corpus AS (SELECT doc_id, unnest(sh) AS s FROM ok WHERE source <> 'src0'),
      j AS (SELECT c.doc_id, COUNT(*) AS n_shingles, COUNT(b.s) AS n_shared
            FROM corpus c LEFT JOIN bench b ON c.s = b.s GROUP BY c.doc_id)
      SELECT doc_id, n_shingles, n_shared,
             (n_shared * 10000) // n_shingles AS contam_bp
      FROM j ORDER BY doc_id""",
    "q71_seq_pack" -> s"""
      WITH RECURSIVE d AS (
        SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents),
      pack(source, rn, doc_id, n_tokens, bin_id, acc) AS (
        SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.source, d.rn, d.doc_id, d.n_tokens,
               CASE WHEN p.acc + d.n_tokens > $PackBudget THEN p.bin_id + 1 ELSE p.bin_id END,
               CASE WHEN p.acc + d.n_tokens > $PackBudget THEN d.n_tokens ELSE p.acc + d.n_tokens END
        FROM pack p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
      SELECT source, bin_id, doc_id, n_tokens
      FROM pack ORDER BY source, bin_id, doc_id""",
    "q72_window_analytics" -> """
      SELECT event_id, user_id, value,
             lag(value) OVER w AS prev_value,
             lead(value) OVER w AS next_value,
             CAST(floor(percent_rank() OVER wv * 10000) AS BIGINT) AS pr_bp,
             ntile(4) OVER wv AS quartile
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
             wv AS (PARTITION BY user_id ORDER BY value, event_id)
      ORDER BY event_id""",
    "q73_stratified_mix" -> """
      SELECT doc_id, lang FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10000
            < CASE WHEN lang = 'en' THEN 3000 ELSE 8000 END
      ORDER BY doc_id""",
    "q74_repetition" -> s"""
      WITH docs AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      tri AS (SELECT doc_id, $shingleList AS tri FROM docs),
      ok AS (SELECT doc_id, CAST(len(tri) AS BIGINT) AS n_tri,
                    CAST(len(list_distinct(tri)) AS BIGINT) AS n_uniq
             FROM tri WHERE len(tri) > 0)
      SELECT doc_id, n_tri, n_uniq,
             ((n_tri - n_uniq) * 10000) // n_tri AS rep_bp
      FROM ok ORDER BY doc_id""",
    "q75_equidepth_hist" -> s"""
      WITH b AS (SELECT quantile_cont(l_extendedprice,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bnds
                 FROM lineitem
                 WHERE $rowSampleSql)
      SELECT CAST(len(list_filter(b.bnds, t -> t + 0.001 < l_extendedprice)) + 1 AS BIGINT) AS bucket,
             COUNT(*) AS n, MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
      FROM lineitem, b
      GROUP BY 1 ORDER BY 1""",
    "q77_normalize" -> """
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      k AS (SELECT doc_id, ws,
                   list_filter(ws, w -> w NOT IN ('the', 'a', 'of')) AS kept
            FROM d)
      SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
             CAST(len(kept) AS BIGINT) AS n_kept,
             md5(array_to_string(kept, ' ')) AS norm_md5
      FROM k ORDER BY doc_id""",
    "q136_compaction_plan" -> """
      WITH files AS (
        SELECT source, doc_id // 32 AS file_id,
               COUNT(*) AS n_docs, SUM(n_chars) AS bytes
        FROM documents GROUP BY source, doc_id // 32),
      cum AS (
        SELECT source, file_id, n_docs, bytes,
               SUM(bytes) OVER (PARTITION BY source ORDER BY file_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM files),
      binned AS (
        SELECT source, file_id, bytes, (cum - bytes) // 4096 AS bin
        FROM cum)
      SELECT source, CAST(bin AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
             CAST(MIN(file_id) AS BIGINT) AS first_file,
             CAST(MAX(file_id) AS BIGINT) AS last_file
      FROM binned GROUP BY source, bin
      ORDER BY source, bin""",
    "q133_cdc_chunking" -> """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      pos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w),
      f AS (SELECT doc_id, i, ws[i] AS word,
              CASE WHEN i >= 2 AND
                CAST(('0x' || substr(md5(ws[i-1] || ' ' || ws[i]), 1, 15)) AS BIGINT) % 8 = 0
                THEN 1 ELSE 0 END AS cut
            FROM pos),
      c AS (SELECT doc_id, i, word,
              SUM(cut) OVER (PARTITION BY doc_id ORDER BY i) + 1 AS chunk_idx
            FROM f)
      SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             md5(string_agg(word, ' ' ORDER BY i)) AS digest
      FROM c GROUP BY doc_id, chunk_idx
      ORDER BY doc_id, chunk_idx""",
    "q79_split_report" -> """
      WITH d AS (
        SELECT lang,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10000 < 8000 THEN 'train'
                    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10000 < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents)
      SELECT lang, split, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      FROM d GROUP BY lang, split ORDER BY lang, split""",
    "q80_vocab" -> """
      WITH c AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      g AS (SELECT word, COUNT(*) AS cnt FROM c GROUP BY word),
      r AS (SELECT word, cnt,
                   CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS vocab_id,
                   CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                   CAST(SUM(cnt) OVER () AS BIGINT) AS total
            FROM g)
      SELECT vocab_id, word, cnt, (cum * 10000) // total AS cum_bp
      FROM r ORDER BY vocab_id""",
    "q81_zorder_layout" -> s"""
      WITH z AS (
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               CAST(${zorderSql("l_partkey", "l_suppkey")} AS DOUBLE) AS z
        FROM lineitem),
      b AS (SELECT quantile_cont(z, [${(1 to 15).map(i => i / 16.0).mkString(", ")}]) AS bnds
            FROM z
            WHERE $rowSampleSql),
      f AS (SELECT z.*, CAST(len(list_filter(b.bnds, t -> t + 0.001 < z.z)) + 1 AS BIGINT) AS file_id
            FROM z, b)
      SELECT file_id, COUNT(*) AS n,
             MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
             MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
      FROM f GROUP BY file_id ORDER BY file_id""",
    "q82_trigram_topk" -> s"""
      WITH docs AS (SELECT lang, string_split(text, ' ') AS words FROM documents),
      tri AS (SELECT lang, unnest($shingleList) AS tri FROM docs),
      g AS (SELECT lang, tri, COUNT(*) AS cnt FROM tri GROUP BY lang, tri),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tri) AS BIGINT) AS rk
            FROM g)
      SELECT lang, tri, cnt, rk FROM r WHERE rk <= 10 ORDER BY lang, rk""",
    "q83_weighted_sample" -> """
      WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
      m AS (SELECT doc_id, lang,
                   CAST(len(ws) AS BIGINT) AS n_words,
                   CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
                   CAST(len(list_filter(ws, w -> w IN ('the', 'a', 'of'))) AS BIGINT) AS n_stop
            FROM d),
      q AS (SELECT doc_id, lang,
                   (n_distinct * (n_words - n_stop) * 10000) // (n_words * n_words) AS quality_bp
            FROM m)
      SELECT doc_id, lang, quality_bp FROM q
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10000 < quality_bp
      ORDER BY doc_id""",
    "q84_source_quota" -> s"""
      WITH r AS (
        SELECT source, doc_id,
               CAST(row_number() OVER (PARTITION BY source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        FROM documents)
      SELECT source, doc_id, rk FROM r WHERE rk <= $SourceQuota
      ORDER BY source, rk""",
    "q76_corr_exact" -> """
      WITH g AS (
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             CAST(floor(((CAST(n AS DOUBLE) * sxy - sx * sy) /
                  (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
                   sqrt(CAST(n AS DOUBLE) * syy - sy * sy))) * 1000000) AS BIGINT) AS corr_fp
      FROM g ORDER BY l_returnflag"""
  )
}
