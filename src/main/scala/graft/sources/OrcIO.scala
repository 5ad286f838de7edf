package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The engine's ORC sink.
  *
  * Spark's ORC path mis-splits the seconds/nanos pair for timestamps in
  * the ONE-SECOND window just before the epoch (truncating division
  * yields seconds = 0 where floor division would yield −1; the nanos
  * stay, so `1969-12-31 23:59:59.xxxxxx` reads back +1 s). The
  * corruption is silent and unrecoverable on read (−0.5 s reads as
  * +0.5 s, indistinguishable from a genuine +0.5 s), so the house sink
  * enforces the contract at WRITE time: any timestamp in (−1 s, 0)
  * fails the write task with a named `ORC_PRE_EPOCH` error instead of
  * landing a value that will silently shift. Round10Spec pins the
  * underlying Spark behavior (so an ORC upgrade that fixes it flips
  * that test and this guard can retire); Round11Spec pins the guard.
  *
  * Scale shape: the guard is a per-row `when` riding the write pass
  * itself — codegen'd, zero extra scans, no driver-side validation
  * pass over the data. Only top-level timestamp columns are guarded;
  * nested timestamps (inside struct/array/map) are rejected loudly at
  * plan time rather than silently passed through.
  */
object OrcIO {

  private val WindowLoUs = -999999L // (−1 s, 0) exclusive, in microseconds
  private val WindowHiUs = -1L

  private def hasNestedTimestamp(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType | TimestampNTZType => true
      case s: StructType => s.fields.exists(f => hasNestedTimestamp(f.dataType))
      case a: ArrayType => hasNestedTimestamp(a.elementType)
      case m: MapType => hasNestedTimestamp(m.keyType) || hasNestedTimestamp(m.valueType)
      case _ => false
    }
  }

  /** Returns `df` with every top-level timestamp column wrapped in the
    * pre-epoch-window guard: values in (−1 s, 0) raise ORC_PRE_EPOCH
    * when the write actually evaluates the row. Exposed separately so
    * specs can drive the guard without a filesystem. */
  def guardPreEpoch(df: DataFrame): DataFrame = {
    df.schema.fields.foreach { f =>
      // TIMESTAMP_NTZ shares ORC's seconds/nanos encoding but its
      // pre-epoch round-trip has no pinning spec yet — reject it at
      // plan time rather than let it bypass the write-time contract
      // (round-11 ADVICE); retire this arm once an NTZ round-trip spec
      // exists on both sides of the window.
      if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        throw new IllegalArgumentException(
          s"ORC_PRE_EPOCH: column '${f.name}' is TIMESTAMP_NTZ, whose ORC " +
          "pre-epoch round-trip is unpinned — cast to TIMESTAMP or write " +
          "parquet/avro")
      if (f.dataType != TimestampType && hasNestedTimestamp(f.dataType))
        throw new IllegalArgumentException(
          s"ORC_PRE_EPOCH: column '${f.name}' nests a timestamp inside " +
          s"${f.dataType.simpleString}; the ORC pre-epoch guard only covers " +
          "top-level timestamp columns — flatten it or write parquet/avro")
    }
    df.schema.fields.filter(_.dataType == TimestampType).foldLeft(df) { (acc, f) =>
      acc.withColumn(f.name,
        when(unix_micros(col(f.name)).between(WindowLoUs, WindowHiUs),
          raise_error(concat(
            lit(s"ORC_PRE_EPOCH: column '${f.name}' holds "),
            col(f.name).cast("string"),
            lit(", inside the (-1s, 0) pre-epoch window that Spark's ORC " +
              "path reads back +1s — write parquet/avro for this data"))))
          .otherwise(col(f.name)))
    }
  }

  /** Guarded ORC write — the only ORC sink engine code should use. */
  def write(df: DataFrame, path: String): Unit =
    guardPreEpoch(df).write.orc(path)
}
