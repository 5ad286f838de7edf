package graft

/** ANSI-mode parity: the queries whose arithmetic could silently
  * change under `spark.sql.ansi.enabled=true` — exact integer moments,
  * DIV/% basis-point math, hash-bucket casts, JSON/string extraction —
  * must produce HASH-IDENTICAL results with ANSI on. This pins the
  * engine's deployment claim both ways: in default mode no query
  * relies on silent-null overflow behavior (all arithmetic is
  * in-bounds by the documented magnitude contracts, e.g. q106's
  * DECIMAL(38,0) bound), and a cluster that mandates ANSI mode — the
  * safer 100 TB posture, where overflow raises instead of biasing —
  * runs the library unchanged.
  *
  * The FULL 153-query sweep was probed ANSI-clean this round
  * (same=153 diff=0 err=0 at sf0.001); this spec keeps the highest-
  * risk subset under continuous test so an ANSI-divergent construct
  * can't land silently. If a new query legitimately needs non-ANSI
  * semantics, document the contract in its scaladoc and leave it off
  * this list.
  */
class AnsiParitySpec extends SparkSpec {

  private val riskiest = Seq(
    "q106_outliers",         // DECIMAL(38,0) exact-moment products
    "q131_linear_attribution", // integer credit split with DIV
    "q134_ks_drift",         // cum-count cross products
    "q110_triangles",        // degree-cap arithmetic over collect_set
    "q115_dense_ids",        // bucket-offset id arithmetic
    "q152_temperature_mix",  // largest-remainder integer allocation
    "q151_int8_quant",       // float->long quant + integer checksums
    "q120_dsir_weight",      // hashed log-free likelihood ratios
    "q123_linear_classifier",// hashed bag-of-words integer weights
    "q111_bigram_surprise",  // surprise basis points via DIV
    "q93_pagerank",          // integer fixed-point rank mass
    "q88_rank_filter",       // Zipf rank gate
    "q17_json_extract",      // string->typed extraction
    "q42_token_count",       // regex token arithmetic
    "q97_funnel")            // ordered-step state machine

  private def resultHash(name: String): String = {
    val rows = SparkEntry.queries(name)(spark, sf("sf0.001")).collect()
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.map(_.mkString("|")).mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  for (name <- riskiest)
    test(s"$name is ANSI-clean: identical hash with spark.sql.ansi.enabled=true") {
      val base = resultHash(name)
      spark.conf.set("spark.sql.ansi.enabled", "true")
      try {
        val ansi = resultHash(name) // an ANSI overflow/cast error throws here
        assert(ansi == base, s"$name diverges under ANSI mode")
      } finally spark.conf.set("spark.sql.ansi.enabled", "false")
    }
}
