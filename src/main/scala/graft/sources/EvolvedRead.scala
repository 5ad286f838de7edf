package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution-safe parquet read across table vintages — the
  * operational complement of `Tables.eventsTsUnit`'s physical-unit
  * probe (SURVEY §2.1 file governance).
  *
  * A long-lived 100 TB table is never one schema: columns get ADDED
  * (old files lack them), RENAMED (parquet matches by name, so the old
  * name silently reads as all-null under plain `mergeSchema`), and
  * WIDENED (int → long breaks the vectorized reader's unified schema).
  * `read` makes those three evolutions explicit and safe:
  *
  *  - `renames` maps historical names to the current one per vintage
  *    BEFORE reconciliation (the metadata a catalog keeps; plain
  *    mergeSchema cannot know it);
  *  - missing columns null-fill with the reconciled type;
  *  - conflicting primitive types reconcile to the WIDEST along
  *    Spark's lossless ladder (byte→short→int→long, float→double,
  *    and integral→double as last resort) — anything unreconcilable
  *    fails loudly at plan time rather than nulling rows at runtime.
  *
  * Each vintage is still one ordinary parquet scan (pushdown/pruning
  * intact) and the result is a plain UNION ALL — no shuffle, no
  * per-row penalty; `_vintage` tags provenance for audits.
  */
object EvolvedRead {

  private val integralLadder: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
  private def isIntegral(t: DataType): Boolean = integralLadder.contains(t)
  private def isFloating(t: DataType): Boolean = t == FloatType || t == DoubleType

  /** Widest lossless common type, or None if incompatible. */
  private[graft] def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (x, y) if isIntegral(x) && isIntegral(y) =>
      Some(integralLadder(math.max(integralLadder.indexOf(x), integralLadder.indexOf(y))))
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    case (x, y) if isIntegral(x) && isFloating(y) => Some(DoubleType)
    case (x, y) if isFloating(x) && isIntegral(y) => Some(DoubleType)
    case _ => None
  }

  /** Read `vintages` (oldest first) as one evolution-reconciled frame.
    *
    * @param renames per-vintage historical→current column renames,
    *                applied before reconciliation (index-aligned with
    *                `vintages`; shorter seq = no renames for the rest)
    * @param tagVintage when true, append `_vintage` = index into
    *                   `vintages` for row provenance
    */
  def read(spark: SparkSession, vintages: Seq[String],
           renames: Seq[Map[String, String]] = Seq.empty,
           tagVintage: Boolean = false): DataFrame = {
    require(vintages.nonEmpty, "evolved read needs at least one vintage path")
    val dfs = vintages.zipWithIndex.map { case (path, i) =>
      val rn = if (i < renames.length) renames(i) else Map.empty[String, String]
      rn.foldLeft(spark.read.parquet(path)) { case (df, (from, to)) =>
        if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
      }
    }
    // reconcile: first-seen column order, widest lossless type
    val reconciled = scala.collection.mutable.LinkedHashMap[String, DataType]()
    dfs.zip(vintages).foreach { case (df, path) =>
      df.schema.fields.foreach { f =>
        reconciled.get(f.name) match {
          case None => reconciled(f.name) = f.dataType
          case Some(t) => reconciled(f.name) = widen(t, f.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"vintage $path: column ${f.name} has irreconcilable type " +
              s"${f.dataType.simpleString} vs ${t.simpleString}"))
        }
      }
    }
    val cols = reconciled.toSeq
    dfs.zipWithIndex.map { case (df, i) =>
      val have = df.columns.toSet
      val aligned = cols.map { case (name, t) =>
        if (have(name)) col(name).cast(t).as(name) else lit(null).cast(t).as(name)
      }
      val base = df.select(aligned: _*)
      if (tagVintage) base.withColumn("_vintage", lit(i)) else base
    }.reduce(_ union _)
  }
}
