package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar text/similarity primitives built from Catalyst higher-order
  * functions — no UDFs anywhere, so every operator stays inside
  * whole-stage codegen and is safe at 100 TB.
  *
  * Portability rule: any hash that must match the DuckDB oracle is
  * derived from md5 hex strings (identical in JVM/Spark/DuckDB), never
  * from engine-native hash() (xxhash64 vs DuckDB's hash differ).
  */
object TextOps {

  /** Fixture texts are space-separated, punctuation-free (FIXTURES.md). */
  def words(text: Column): Column = split(text, " ")

  /** Word 3-gram shingles: one per window start, empty for docs <3 words.
    *
    * The short-doc case must be guarded explicitly: Spark's
    * `sequence(1, 0)` steps DOWN by default (yielding [1, 0]) and the
    * `slice(ws, 0, 3)` it would trigger throws at runtime — unlike
    * DuckDB's `generate_series(1, 0)`, which is empty. */
  def shingles3(ws: Column): Column =
    when(size(ws) >= 3,
      transform(
        sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", slice(ws, i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** MinHash component for seed `k`: the minimum md5 over shingles of
    * "k|shingle". Min of hex strings == min of the underlying 128-bit
    * hash, and is directly comparable across engines. */
  def minhash(shs: Column, k: Int): Column = {
    val seed = graft.expressions.MinHashSigs.SeedConsts(k)
    array_min(transform(shs, sh =>
      conv(substring(md5(sh), 1, 15), 16, 10).cast("long").bitwiseXOR(lit(seed))))
  }

  /** Per-word 16-bit hashes (first 4 md5 hex chars as int). Project this
    * into its own column BEFORE simhash16FromHashes — the md5 work then
    * runs once per word instead of once per (word, bit). */
  def wordHashes16(ws: Column): Column =
    transform(ws, w => conv(substring(md5(w), 1, 4), 16, 10).cast("int"))

  /** 16-bit SimHash over the precomputed hash array: bit b is set iff
    * the sum of (+1/-1 per word by hash-bit b) is positive. 16 cheap int
    * folds — zero explodes, zero shuffles until the caller aggregates. */
  def simhash16FromHashes(hs: Column): Column =
    (0 until 16).map { b =>
      val bitSum = aggregate(hs, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1 << b)) > 0, 1).otherwise(-1))
      when(bitSum > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Convenience composition (single-expression form). */
  def simhash16(ws: Column): Column = simhash16FromHashes(wordHashes16(ws))

  val FpMod = 1000000007L

  /** Position-weighted polynomial fingerprint mod 1e9+7: order-sensitive
    * (unlike a bag hash) yet exactly portable — per-word value is 7 md5
    * hex chars (< 2^28), weighted by 1-based position. */
  def fingerprint(ws: Column): Column =
    aggregate(
      sequence(lit(1), size(ws)), lit(0L),
      (acc, i) => (acc + (i.cast("long") *
        (conv(substring(md5(element_at(ws, i)), 1, 7), 16, 10).cast("long") % FpMod)) % FpMod) % FpMod)
}
