package graft

/** ANSI-switch invariance. Spark 4 defaults `spark.sql.ansi.enabled`
  * to TRUE, so the entire oracle-green suite already runs under ANSI —
  * overflow raises instead of silently nulling, which is the right
  * 100 TB posture and makes the 150/150 oracle board an ANSI result.
  * What remains to pin is the INVARIANCE claim: no query's semantics
  * depend on the switch in either direction — a legacy cluster running
  * ANSI-off gets bit-identical results, and no query is quietly
  * leaning on ANSI try-eval/null semantics.
  *
  * The FULL 153-query sweep was probed hash-identical across the
  * switch this round (zero diffs, zero errors at sf0.001); this spec
  * keeps the highest-risk subset — exact integer moments, DIV
  * basis-point math, hash-bucket casts, JSON/string extraction — under
  * continuous test. If a new query legitimately needs one mode,
  * document the contract in its scaladoc and leave it off this list.
  *
  * (Round-8 lesson baked in: restore the ORIGINAL conf value — a
  * hardcoded "restore" to false left the shared session non-default
  * and drifted later suites' plans.)
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
    "q97_funnel",            // ordered-step state machine
    "q156_avro_io",          // round 9: Σ micros-of-day + decimal-cents checksums
    "q157_csv_io",           // round 9: conv(hex)->long props checksum over CSV
    "q158_json_io",          // round 9: same checksum class over JSON-lines
    "q159_text_io",          // round 9: md5-bucket length/checksum sums
    "q160_epoch_shuffle",    // round 9: rank x (doc_id mod p) order checksum
    "q161_orc_io",           // round 10: conv(hex)->long props checksum over ORC
    "q163_hamming_ann",      // round 10: sign-bit packing + xor/bit_count ranking
    "q166_rrf_fusion",       // round 10: integer micro-unit rank fusion with DIV
    "q47_approx_distinct",   // round 11: |approx-exact|*100 <= 5*exact long math
    "q48_approx_quantiles",  // round 11: rank-bp tolerance verdict in long math
    "q145_tdigest_quantiles")// round 11: per-key rank-bp verdict in long math

  private def resultHash(name: String): String = {
    val rows = SparkEntry.queries(name)(spark, sf("sf0.001")).collect()
    java.security.MessageDigest.getInstance("MD5")
      .digest(rows.map(_.mkString("|")).mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  for (name <- riskiest)
    test(s"$name is ANSI-switch invariant (identical hash with ansi on and off)") {
      val prev = spark.conf.get("spark.sql.ansi.enabled")
      try {
        spark.conf.set("spark.sql.ansi.enabled", "true")
        val on = resultHash(name) // an ANSI overflow/cast error throws here
        spark.conf.set("spark.sql.ansi.enabled", "false")
        val off = resultHash(name)
        assert(on == off, s"$name diverges across the ANSI switch")
      } finally spark.conf.set("spark.sql.ansi.enabled", prev)
    }
}
