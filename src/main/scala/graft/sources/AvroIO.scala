package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder, SchemaCompatibility}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink — Beam Python's `ReadFromAvro` /
  * `WriteToAvro` (io/avroio.py), the other interchange format a
  * training-data pipeline is expected to speak (alongside Parquet and
  * TFRecord), implemented directly on the PUBLIC Avro 1.12 library that
  * ships with Spark (`org.apache.avro`) — the `spark-avro` connector
  * module is not on this classpath, so the container framing, schema
  * mapping, and commit protocol are built here from the public spec.
  *
  * Schema mapping (both directions, a deliberate closed subset):
  * long/int/double/float/boolean/string/bytes, `timestamp-micros`
  * logical longs ⇄ TimestampType, one-level arrays of those, and
  * nullable-as-union-with-null. Anything else fails loudly at PLAN
  * time (the EvolvedRead lesson: a mapping surprise must never surface
  * mid-job as a executor cast error).
  *
  * Scale shape: one `.avro` container per input partition on write
  * (task-attempt temp + rename-on-commit, so speculation can't
  * interleave a shard), and on read one task per SYNC-ALIGNED BYTE
  * RANGE, not per file — Avro containers are internally blocked with
  * a 16-byte sync marker terminating the header and every block, so a
  * split seeks to the first sync after its start offset and stops
  * past the first sync after its end (the format's own parallelism
  * contract; `splitBytes` defaults to 32 MiB). A 150 MB shard thus
  * reads as ~5 tasks — read parallelism follows BYTES, not the
  * writer's sharding, which is what a 100 TB table requires. Records
  * stream through both directions in constant memory; the writer's
  * sync marker is derived deterministically from (dir, partition) so a
  * shard's bytes are a pure function of its input — which is what lets
  * [[graft.queries.Round9Queries]] reuse the layout write-once.
  *
  * Column projection on read (`ReadFromAvro(columns=...)` in Beam ≥2.5
  * terms): a reader schema containing only the requested fields makes
  * Avro skip-decode the dropped ones — the container-format analogue of
  * parquet column pruning (cheaper decode, same IO).
  */
object AvroIO {

  /** Catalyst → Avro for the supported subset; nullable ⇒ union[null, T]. */
  private[graft] def avroSchemaFor(st: StructType, recordName: String): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case ArrayType(el, false) => Schema.createArray(prim(el))
      case other => throw new IllegalArgumentException(
        s"AvroIO: unsupported Catalyst type ${other.simpleString} " +
          "(supported: long/int/double/float/boolean/string/binary/" +
          "timestamp, non-null arrays of those)")
    }
    val fields = st.fields.map { f =>
      val base = prim(f.dataType)
      val s = if (f.nullable) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, s, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    val rec = Schema.createRecord(recordName, null, "graft.avro", false)
    rec.setFields(java.util.List.of(fields: _*))
    rec
  }

  /** Avro → Catalyst for the same subset (strips the nullable union). */
  private[graft] def structTypeFor(schema: Schema): StructType = {
    def dt(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(branches.size == 1 && branches.size < s.getTypes.size,
          s"AvroIO: only union[null, T] is supported, got $s")
        (dt(branches.head)._1, true)
      case Schema.Type.LONG =>
        if (s.getLogicalType != null &&
            s.getLogicalType.getName == "timestamp-micros") (TimestampType, false)
        else (LongType, false)
      case Schema.Type.INT     => (IntegerType, false)
      case Schema.Type.DOUBLE  => (DoubleType, false)
      case Schema.Type.FLOAT   => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING  => (StringType, false)
      case Schema.Type.BYTES   => (BinaryType, false)
      case Schema.Type.ARRAY   =>
        val (el, n) = dt(s.getElementType)
        (ArrayType(el, containsNull = n), false)
      case other => throw new IllegalArgumentException(
        s"AvroIO: unsupported Avro type $other in $s")
    }
    StructType(schema.getFields.asScala.map { f =>
      val (t, nullable) = dt(f.schema())
      StructField(f.name(), t, nullable)
    }.toSeq)
  }

  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => s
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (t: java.sql.Timestamp, TimestampType) =>
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case (a: scala.collection.Seq[_], ArrayType(el, _)) =>
      a.map(toAvro(_, el)).asJava
    case (x, _) => x // long/int/double/float/boolean pass through
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (b: ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (us: java.lang.Long, TimestampType) =>
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us.longValue(), 1000000L) * 1000L).toInt)
      t
    case (l: java.util.Collection[_], ArrayType(el, _)) =>
      l.asScala.map(fromAvro(_, el)).toSeq
    case (x, _) => x
  }

  /** Write `df` as one Avro container file per partition under `dir`
    * (overwrites), null codec, deterministic sync marker. */
  def write(df: DataFrame, dir: String): Unit = {
    val catalystSchema = df.schema
    val schemaJson = avroSchemaFor(catalystSchema, "GraftRecord").toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    root.getFileSystem(conf.value).delete(root, true)
    df.rdd.foreachPartition { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val fin = new Path(dir, f"part-$pid%05d.avro")
      val tmp = new Path(dir, f".part-$pid%05d.avro.attempt-${tc.taskAttemptId()}")
      val fs = fin.getFileSystem(conf.value)
      // shard bytes must be deterministic for write-once layout reuse —
      // derive the 16-byte sync marker from (dir, pid) instead of
      // DataFileWriter's default SecureRandom draw
      val sync = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$dir#$pid".getBytes("UTF-8"))
      val out = fs.create(tmp, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      var ok = false
      try {
        writer.create(schema, out, sync)
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < catalystSchema.length) {
            rec.put(i, toAvro(r.get(i), catalystSchema(i).dataType))
            i += 1
          }
          writer.append(rec)
        }
        writer.close() // flushes the final block before the rename
        ok = true
      } finally {
        if (!ok) { try writer.close() catch { case _: Throwable => () }
          fs.delete(tmp, false) }
      }
      if (!fs.rename(tmp, fin)) {
        if (fs.exists(fin)) fs.delete(tmp, false)
        else throw new java.io.IOException(s"AvroIO: commit rename failed for $fin")
      }
    }
  }

  /** Read every `.avro` container under `dir`, one task per
    * sync-aligned byte range of ≤`splitBytes`. `columns`, if
    * non-empty, is pushed into the Avro READER schema so dropped
    * fields are skip-decoded, and fixes the output column order.
    * Schema is taken from the first shard's header on the driver; a
    * shard written with a different schema fails its task loudly
    * (Avro schema-resolution error), never silently coerces. */
  def read(spark: SparkSession, dir: String, columns: Seq[String] = Nil,
           splitBytes: Long = 32L << 20): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    val statuses = fs.globStatus(new Path(root, "*.avro")).sortBy(_.getPath.toString)
    val files = statuses.map(_.getPath.toString)
    require(files.nonEmpty, s"AvroIO: no .avro files under $dir")

    // writer schema from the first shard's header (driver-side, no rows)
    val writerSchema = {
      val in = fs.open(new Path(files.head))
      try new DataFileStream(in, new GenericDatumReader[GenericRecord]()).getSchema
      finally in.close()
    }
    val readerSchema =
      if (columns.isEmpty) writerSchema
      else {
        val byName = writerSchema.getFields.asScala.map(f => f.name() -> f).toMap
        val missing = columns.filterNot(byName.contains)
        require(missing.isEmpty,
          s"AvroIO: projected columns ${missing.mkString(", ")} absent from " +
            s"writer schema ${writerSchema.getFields.asScala.map(_.name()).mkString("[", ", ", "]")}")
        val fields = columns.map { c =>
          val f = byName(c)
          new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
        }
        val rec = Schema.createRecord("GraftProjected", null, "graft.avro", false)
        rec.setFields(java.util.List.of(fields: _*))
        rec
      }
    val catalystSchema = structTypeFor(readerSchema)
    val writerJson = writerSchema.toString
    val readerJson = readerSchema.toString

    val splits = toSplits(statuses.map(s => s.getPath.toString -> s.getLen), splitBytes)
    val rdd = spark.sparkContext.parallelize(splits, splits.length)
      .flatMap(rowsFromSplit(conf, Some(writerJson), readerJson, catalystSchema))
    spark.createDataFrame(rdd, catalystSchema)
  }

  /** Evolution-aware read across Avro table vintages — the Avro twin of
    * [[EvolvedRead]] for parquet, except the resolution engine is
    * Avro's OWN (the reason the format exists): each file resolves
    * against `reader` using the writer schema in ITS OWN header, so
    * vintages with different schemas coexist in one scan. The caller's
    * `reader` StructType is the one contract; per the Avro spec it
    * gets: added nullable fields null-filled (union-null default),
    * dropped fields skip-decoded, int→long / float→double promotion,
    * and historical names matched via `aliases` (current → old names,
    * the catalog metadata a rename leaves behind).
    *
    * Every vintage's header schema is checked against `reader` with
    * `SchemaCompatibility` ON THE DRIVER, so an irreconcilable vintage
    * (e.g. a non-null reader field absent from an old writer, or a
    * narrowing long→int) fails at PLAN time with the vintage path in
    * the message — the same loudness contract as [[EvolvedRead]].
    * One header read per vintage directory, not per file. */
  def readEvolved(spark: SparkSession, dirs: Seq[String], reader: StructType,
                  aliases: Map[String, Seq[String]] = Map.empty,
                  splitBytes: Long = 32L << 20): DataFrame = {
    require(dirs.nonEmpty, "AvroIO: evolved read needs at least one vintage dir")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // same record name as write() emits: Avro record resolution matches
    // by (unqualified) name, so the reader must not invent a new one
    val readerSchema = {
      val base = avroSchemaFor(reader, "GraftRecord")
      if (aliases.isEmpty) base
      else {
        val fields = base.getFields.asScala.map { f =>
          val nf = new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
          aliases.getOrElse(f.name(), Nil).foreach(nf.addAlias)
          nf
        }
        val rec = Schema.createRecord("GraftRecord", null, "graft.avro", false)
        rec.setFields(java.util.List.of(fields.toSeq: _*))
        rec
      }
    }
    val sized = dirs.flatMap { d =>
      val root = new Path(d)
      val fs = root.getFileSystem(conf.value)
      val sts = fs.globStatus(new Path(root, "*.avro")).sortBy(_.getPath.toString)
      require(sts.nonEmpty, s"AvroIO: no .avro files under $d")
      val in = fs.open(sts.head.getPath)
      val w = try new DataFileStream(in, new GenericDatumReader[GenericRecord]()).getSchema
        finally in.close()
      // applyAliases first: SchemaCompatibility does not consult aliases,
      // but the runtime ResolvingDecoder does — check what will actually run
      val compat = SchemaCompatibility.checkReaderWriterCompatibility(
        readerSchema, Schema.applyAliases(w, readerSchema))
      if (compat.getType != SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE)
        throw new IllegalArgumentException(
          s"AvroIO: vintage $d cannot evolve to the reader schema: " +
            compat.getResult.getIncompatibilities.asScala.map(_.getMessage).mkString("; "))
      sts.map(s => s.getPath.toString -> s.getLen)
    }
    val catalystSchema = structTypeFor(readerSchema)
    val readerJson = readerSchema.toString
    val splits = toSplits(sized, splitBytes)
    val rdd = spark.sparkContext.parallelize(splits, splits.length)
      .flatMap(rowsFromSplit(conf, None, readerJson, catalystSchema))
    spark.createDataFrame(rdd, catalystSchema)
  }

  /** Chop (file, length) pairs into sync-split byte ranges. */
  private def toSplits(sized: Seq[(String, Long)], splitBytes: Long): Seq[(String, Long, Long)] = {
    require(splitBytes > 0, s"AvroIO: splitBytes must be positive, got $splitBytes")
    sized.flatMap { case (f, len) =>
      if (len == 0) Seq((f, 0L, 0L))
      else (0L until len by splitBytes).map(s => (f, s, math.min(s + splitBytes, len)))
    }
  }

  /** Open one sync-aligned byte range of a container and stream it as
    * Rows under the reader schema: seek to the first sync point after
    * `start`, stop past the first sync point after `end` — every block
    * is read by exactly one split (the Avro container's own split
    * contract). `writerJson = None` ⇒ take the writer schema from the
    * file's own header (the evolved-read path). Never leaks the
    * handle: closes on task end (limit/take) and on any mid-iteration
    * decode failure. */
  private def rowsFromSplit(
      conf: org.apache.spark.util.SerializableConfiguration,
      writerJson: Option[String], readerJson: String,
      catalystSchema: StructType)(split: (String, Long, Long)): Iterator[Row] = {
    val (file, start, end) = split
    val r = new Schema.Parser().parse(readerJson)
    val datumReader = writerJson match {
      case Some(w) => new GenericDatumReader[GenericRecord](
        new Schema.Parser().parse(w), r)
      case None => new GenericDatumReader[GenericRecord](null, r)
    }
    val in = new org.apache.avro.mapred.FsInput(new Path(file), conf.value)
    val reader = org.apache.avro.file.DataFileReader.openReader(in, datumReader)
    reader.sync(start) // lands on the header's trailing sync when start = 0
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit] { _ => reader.close(); in.close() })
    val fields = catalystSchema.fields
    new Iterator[Row] {
      override def hasNext: Boolean = reader.hasNext && !reader.pastSync(end)
      override def next(): Row = {
        val rec = try reader.next()
          catch { case e: Throwable => reader.close(); in.close(); throw e }
        val vals = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          vals(i) = fromAvro(rec.get(fields(i).name), fields(i).dataType)
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
  }
}
