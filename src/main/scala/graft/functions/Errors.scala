package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dead-letter routing — Beam's `ParDo.with_exception_handling` /
  * tagged-error-output pattern [BEAM pvalue.TaggedOutput], the Spark
  * way: instead of a try/catch per element, the fallible step is an
  * expression that yields NULL on failure, and one narrow plan splits
  * survivors from dead letters. Both outputs are lazy DataFrames over
  * the same scan (Spark dedups it via exchange/cache reuse), each side
  * keeps flowing through the rest of the pipeline, and the dead-letter
  * side preserves the raw payload for replay — at 100 TB this is a
  * filter, not an exception storm.
  *
  * Works unchanged on streaming inputs (pure row-local expressions).
  */
object Errors {

  /** Parse `jsonCol` against `schema`; rows whose payload does not
    * parse go to the dead-letter output with the raw column intact.
    * Returns (parsed — input columns plus the struct fields, deadLetter
    * — input columns only). */
  def parseJsonWithDeadLetter(df: DataFrame, jsonCol: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    // reserved names (same guard discipline as saltedAgg's __salt): a
    // schema that already declares __corrupt would silently misroute
    // rows, and an input column named __parsed would be clobbered.
    // (A JSON PAYLOAD carrying a "__corrupt" key routes to the dead
    // letter side — callers with such payloads must rename upstream.)
    require(!schema.fieldNames.contains("__corrupt"),
      "parseJsonWithDeadLetter: schema must not declare the reserved field __corrupt")
    require(!df.columns.contains("__parsed"),
      "parseJsonWithDeadLetter: input must not contain the reserved column __parsed")
    // PERMISSIVE from_json yields an all-null struct for malformed
    // payloads (indistinguishable from legitimately-null fields), and a
    // null struct for empty input — the corrupt-record column is the
    // unambiguous failure signal for the first case, null-struct for
    // the second
    val ext = schema.add("__corrupt", org.apache.spark.sql.types.StringType)
    val parsed = df.withColumn("__parsed",
      from_json(col(jsonCol), ext, Map("columnNameOfCorruptRecord" -> "__corrupt")))
    val ok = col("__parsed").isNotNull && col("__parsed.__corrupt").isNull
    val good = parsed.filter(ok)
      .select(df.columns.map(col) ++ schema.fieldNames.map(f => col(s"__parsed.$f")): _*)
    val dead = parsed.filter(!ok).select(df.columns.map(col): _*)
    (good, dead)
  }

  /** General form: route on any fallible expression — rows where
    * `attempt` is null go to the dead-letter side. */
  def withDeadLetter(df: DataFrame, attempt: Column, as: String)
      : (DataFrame, DataFrame) = {
    val tried = df.withColumn(as, attempt)
    (tried.filter(col(as).isNotNull),
      tried.filter(col(as).isNull).select(df.columns.map(col): _*))
  }
}
