package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions.{BloomFilterAgg, BloomMightContain, CdcStarts, CosineSimilarity, CountMinSketchAgg, MinHashSigs, NearestCells, Shingles2, Shingles3, Simhash16, WordFingerprint, ZorderKey}

/** Registration of graft's native Catalyst expressions.
  *
  * Two routes, same registry entry:
  *  - `ensure(spark)` — idempotent runtime registration, called by the
  *    query packs so the driver contract works on any session;
  *  - `GraftExtensions` — the SparkSessionExtensions class for
  *    `SparkSession.builder.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftFunctions {

  private val all = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)): Expression),
    (new FunctionIdentifier("word_fingerprint"),
      new ExpressionInfo(classOf[WordFingerprint].getName, "word_fingerprint"),
      (children: Seq[Expression]) => WordFingerprint(children.head): Expression),
    (new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (children: Seq[Expression]) => MinHashSigs(children.head): Expression),
    (new FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[Simhash16].getName, "simhash16"),
      (children: Seq[Expression]) => Simhash16(children.head): Expression),
    (new FunctionIdentifier("shingles2"),
      new ExpressionInfo(classOf[Shingles2].getName, "shingles2"),
      (children: Seq[Expression]) => Shingles2(children.head): Expression),
    (new FunctionIdentifier("shingles3"),
      new ExpressionInfo(classOf[Shingles3].getName, "shingles3"),
      (children: Seq[Expression]) => Shingles3(children.head): Expression),
    (new FunctionIdentifier("nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "nearest_cells"),
      (children: Seq[Expression]) => (children match {
        case Seq(v, cents) => new NearestCells(v, cents)
        case Seq(v, cents, m) => NearestCells(v, cents, m)
        case _ => throw new IllegalArgumentException(
          "nearest_cells expects 2 or 3 arguments")
      }): Expression),
    (new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "cms_sketch"),
      (children: Seq[Expression]) =>
        CountMinSketchAgg(children.head).toAggregateExpression(): Expression),
    (new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (children: Seq[Expression]) =>
        BloomFilterAgg(children.head).toAggregateExpression(): Expression),
    (new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1)): Expression),
    (new FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[ZorderKey].getName, "zorder_key"),
      (children: Seq[Expression]) => ZorderKey(children(0), children(1)): Expression),
    (new FunctionIdentifier("cdc_starts"),
      new ExpressionInfo(classOf[CdcStarts].getName, "cdc_starts"),
      (children: Seq[Expression]) => (children match {
        case Seq(bin, w: Literal, m: Literal) =>
          CdcStarts(bin, w.value.asInstanceOf[Int], m.value.asInstanceOf[Int])
        case _ => throw new IllegalArgumentException(
          "cdc_starts expects (binary, int literal window, int literal mod)")
      }): Expression)
  )

  /** Idempotent per-session registration. */
  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { f =>
      if (!reg.functionExists(f._1)) reg.registerFunction(f._1, f._2, f._3)
    }
  }

  private[graft] def inject(ext: SparkSessionExtensions): Unit =
    all.foreach(ext.injectFunction)
}

/** `spark.sql.extensions`-compatible entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
