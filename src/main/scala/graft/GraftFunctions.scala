package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.CosineSimilarity

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

  private val cosine = (
    new FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)): Expression
  )

  /** Idempotent per-session registration. */
  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(cosine._1)) {
      reg.registerFunction(cosine._1, cosine._2, cosine._3)
    }
  }

  private[graft] def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(cosine)
}

/** `spark.sql.extensions`-compatible entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
