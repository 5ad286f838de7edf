package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink coverage beyond the parquet fixtures (SURVEY.md §2.1):
  * text, CSV, JSON round-trips; dynamic destinations via partitionBy;
  * glob reads (Beam MatchFiles); Impulse. */
class IoSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_io").toString

  test("text round-trip (ReadFromText/WriteToText)") {
    import spark.implicits._
    val dir = tmp() + "/t"
    val lines = Seq("alpha", "beta", "gamma")
    lines.toDF("value").write.text(dir)
    val back = spark.read.text(dir).as[String].collect().sorted
    assert(back.toSeq == lines.sorted)
  }

  test("csv round-trip with header and schema") {
    val dir = tmp() + "/c"
    val df = Tables.region(spark, sf("sf0.001"))
    df.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == df.count())
    assert(back.columns.toSeq == df.columns.toSeq)
  }

  test("json round-trip preserves nested structs") {
    val dir = tmp() + "/j"
    val df = Tables.nation(spark, sf("sf0.001"))
      .select(struct(col("n_nationkey"), col("n_name")).as("rec"), col("n_regionkey"))
    df.write.json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == df.count())
    assert(back.select("rec.n_name").distinct().count() ==
      df.select("rec.n_name").distinct().count())
  }

  test("partitionBy write = dynamic destinations; glob read = MatchFiles") {
    val dir = tmp() + "/p"
    Tables.documents(spark, sf("sf0.001"))
      .write.partitionBy("lang").parquet(dir)
    // each lang lands in its own directory
    val langs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langs.length == 5, langs.mkString(","))
    // glob-select a subset of destinations
    val two = spark.read.parquet(s"$dir/lang=en", s"$dir/lang=de")
    val full = Tables.documents(spark, sf("sf0.001"))
    assert(two.count() ==
      full.filter(col("lang").isin("en", "de")).count())
    // partition pruning on the full read
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(pruned.count() == full.filter(col("lang") === "en").count())
  }

  test("impulse: single-element kickoff") {
    assert(spark.range(1).count() == 1)
  }

  test("orc round-trip") {
    // (spark-avro is not on this classpath — avro would need the module jar)
    val dir = tmp()
    val df = Tables.nation(spark, sf("sf0.001"))
    df.write.orc(s"$dir/o")
    assert(spark.read.orc(s"$dir/o").count() == df.count())
  }

  test("tfrecord framing matches independently computed golden bytes") {
    // golden values computed OUTSIDE the JVM from the public TFRecord
    // spec (pure-python CRC32C + rotr15+0xa282ead8 masking) — a
    // masking/endianness slip in TFRecordIO would still round-trip
    // through itself, so only an external pin catches it
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    assert(hex(graft.sources.TFRecordIO.frame("abc".getBytes("UTF-8")))
      == "0300000000000000b099490e6162636e57f121")
    assert(hex(graft.sources.TFRecordIO.frame(Array.emptyByteArray))
      == "000000000000000029039807d8ea82a2")
  }

  test("tfrecord round-trip on real documents: bytes identical, one shard per partition") {
    import graft.sources.TFRecordIO
    val dir = tmp() + "/tfr"
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(encode(col("text"), "UTF-8").as("record"))
      .repartition(4)
    TFRecordIO.write(docs, dir)
    val shards = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".tfrecord"))
    assert(shards.length == 4, s"expected one shard per partition, got ${shards.toSeq}")
    val back = TFRecordIO.read(spark, dir)
    assert(back.count() == docs.count())
    // content parity: multiset of md5s over the payload bytes
    def digests(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(md5(col(c)).as("d")).groupBy("d").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(digests(back, "record") == digests(docs, "record"))
  }

  test("tfrecord read fails loudly on corruption, not silently truncates") {
    import graft.sources.TFRecordIO
    val dir = tmp() + "/tfr_bad"
    import spark.implicits._
    TFRecordIO.write(Seq("hello", "world").toDF("s")
      .select(encode(col("s"), "UTF-8").as("r")).coalesce(1), dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tfrecord")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(14) = (bytes(14) ^ 0x1).toByte // flip a payload bit in record 1
    java.nio.file.Files.write(f.toPath, bytes)
    // remove Hadoop LocalFS's checksum sidecar so the corruption reaches
    // the TFRecord-level CRC (on HDFS/object stores a bit flip inside a
    // checksum block is exactly what the record CRC exists to catch)
    new java.io.File(f.getParentFile, "." + f.getName + ".crc").delete()
    val e = intercept[org.apache.spark.SparkException] {
      TFRecordIO.read(spark, dir).count()
    }
    assert(e.getMessage.contains("CRC") ||
      Option(e.getCause).exists(_.getMessage.contains("CRC")), s"got: ${e.getMessage}")
  }

  test("avro round-trip covers the full supported type subset incl nulls") {
    import graft.sources.AvroIO
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType, nullable = true),
      StructField("d", DoubleType, nullable = false),
      StructField("f", FloatType, nullable = false),
      StructField("b", BooleanType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("ts", TimestampType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))
    val t0 = java.sql.Timestamp.valueOf("2026-08-15 01:02:03.123456")
    val rows = Seq(
      Row(1L, 7, 1.5, 2.5f, true, "alpha", Array[Byte](1, 2, 3), t0, Seq(0.1f, 0.2f)),
      Row(2L, null, -0.25, 0f, false, null, null, t0, Seq.empty[Float]),
      Row(3L, 0, 0.0, -1f, true, "", Array.emptyByteArray, t0, Seq(9f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp() + "/avro"
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema == schema.copy(fields = schema.fields.map(f =>
      f.copy(dataType = f.dataType match {
        case ArrayType(el, _) => ArrayType(el, containsNull = false)
        case t => t
      }))), s"schema drift: ${back.schema.treeString}")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("n"), col("d"), col("f"), col("b"), col("s"),
        md5(coalesce(col("bin"), lit(Array.emptyByteArray))).as("binmd5"),
        col("bin").isNull.as("binnull"),
        unix_micros(col("ts")).as("us"), col("vec"))
        .collect().map(_.toSeq).toSet
    assert(norm(back) == norm(df))
  }

  test("avro read projection prunes to the reader schema in the requested order") {
    import graft.sources.AvroIO
    val dir = tmp() + "/avro_p"
    AvroIO.write(Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props")).repartition(3), dir)
    val back = AvroIO.read(spark, dir, columns = Seq("user_id", "event_type"))
    assert(back.columns.toSeq == Seq("user_id", "event_type"))
    val expect = Tables.events(spark, sf("sf0.001"))
      .groupBy(col("user_id"), col("event_type")).count()
      .collect().map(_.toSeq).toSet
    assert(back.groupBy(col("user_id"), col("event_type")).count()
      .collect().map(_.toSeq).toSet == expect)
  }

  test("avro fails at plan time on unsupported types and missing projections") {
    import graft.sources.AvroIO
    val bad = Tables.nation(spark, sf("sf0.001"))
      .select(map(col("n_name"), col("n_nationkey")).as("m"))
    val e = intercept[IllegalArgumentException] { AvroIO.write(bad, tmp() + "/x") }
    assert(e.getMessage.contains("unsupported Catalyst type"))
    val dir = tmp() + "/avro_m"
    AvroIO.write(Tables.region(spark, sf("sf0.001")), dir)
    val e2 = intercept[IllegalArgumentException] {
      AvroIO.read(spark, dir, columns = Seq("r_name", "nope"))
    }
    assert(e2.getMessage.contains("nope"))
  }

  test("avro shard bytes are deterministic (fixed sync marker) for write-once reuse") {
    import graft.sources.AvroIO
    val df = Tables.region(spark, sf("sf0.001")).coalesce(1)
    val d1 = tmp() + "/avro_d"
    // same target path twice: ensureScratch reuse is sound only if a
    // rebuild at the SAME location reproduces identical bytes
    def shardMd5(): String = {
      AvroIO.write(df, d1)
      val f = new java.io.File(d1).listFiles().filter(_.getName.endsWith(".avro")).head
      java.security.MessageDigest.getInstance("MD5")
        .digest(java.nio.file.Files.readAllBytes(f.toPath))
        .map("%02x".format(_)).mkString
    }
    assert(shardMd5() == shardMd5())
  }

  test("avro sync-split read: byte ranges partition one container without loss or dup") {
    import graft.sources.AvroIO
    val dir = tmp() + "/avro_s"
    // ONE container, so any parallelism must come from sync splits
    AvroIO.write(Tables.events(spark, sf("sf0.01"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"))
      .coalesce(1), dir)
    val whole = AvroIO.read(spark, dir)
    val split = AvroIO.read(spark, dir, splitBytes = 64 * 1024)
    assert(split.rdd.getNumPartitions > 1,
      s"expected multiple sync splits, got ${split.rdd.getNumPartitions}")
    assert(split.count() == whole.count())
    assert(split.collect().map(_.toSeq).toSet == whole.collect().map(_.toSeq).toSet)
    // each block lands in exactly one split: position-insensitive but
    // multiplicity-sensitive checksum
    def ck(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("event_id")), count(lit(1))).collect()(0).toSeq
    assert(ck(split) == ck(whole))
  }

  test("avro evolved read: per-file resolution widens, null-fills, renames via alias") {
    import graft.sources.AvroIO
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // vintage 1: n is INT, the string column is still called `gone`
    val v1 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType, nullable = false),
      StructField("gone", StringType, nullable = true)))
    // vintage 2: n widened to LONG, column renamed to `s`
    val v2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val d1 = tmp() + "/av_v1"; val d2 = tmp() + "/av_v2"
    AvroIO.write(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 7, "a"), Row(2L, 8, null)), 1), v1), d1)
    AvroIO.write(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(3L, 9L, "c")), 1), v2), d2)
    // reader contract: widened n, renamed s (alias to the v1 name), and
    // a brand-new nullable column absent from both vintages
    val reader = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("extra", IntegerType, nullable = true)))
    val back = AvroIO.readEvolved(spark, Seq(d1, d2), reader,
      aliases = Map("s" -> Seq("gone")))
    assert(back.schema.fieldNames.toSeq == Seq("id", "n", "s", "extra"))
    assert(back.collect().map(_.toSeq).toSet == Set(
      Seq(1L, 7L, "a", null), Seq(2L, 8L, null, null), Seq(3L, 9L, "c", null)))
    // irreconcilable vintage fails at PLAN time, naming the vintage:
    // reader narrows v2's long n to int
    val narrow = StructType(Seq(StructField("n", IntegerType, nullable = false)))
    val e = intercept[IllegalArgumentException] {
      AvroIO.readEvolved(spark, Seq(d2), narrow)
    }
    assert(e.getMessage.contains("cannot evolve") && e.getMessage.contains("av_v2"))
    // so does a non-null reader column no vintage can supply
    val orphan = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("mandatory", LongType, nullable = false)))
    val e2 = intercept[IllegalArgumentException] {
      AvroIO.readEvolved(spark, Seq(d1), orphan)
    }
    assert(e2.getMessage.contains("cannot evolve"))
  }

  test("accumulators count side observations (Beam metrics counter)") {
    import spark.implicits._
    val malformed = spark.sparkContext.longAccumulator("malformed")
    val parsed = Tables.events(spark, sf("sf0.001"))
      .select(col("props")).as[String]
      .mapPartitions { it =>
        it.map { s =>
          if (!s.startsWith("{")) malformed.add(1)
          s.length
        }
      }
    parsed.count() // action drives the accumulator
    assert(malformed.value == 0) // fixture props are all JSON objects
  }

  test("foreachBatch streams micro-batches into parquet (WriteToFiles)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = tmp()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(s"$dir/out")
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    mem.addData(1L, 2L, 3L)
    q.processAllAvailable()
    mem.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$dir/out").count() == 5)
  }

  test("foreachBatch idempotent sink: re-delivered batch overwrites instead of duplicating") {
    // exactly-once file delivery under at-least-once foreachBatch: key
    // the output by batch id and OVERWRITE that partition, so a batch
    // replayed after a crash lands on top of its previous attempt. With
    // partitionOverwriteMode=dynamic only the replayed batch's partition
    // is touched — other batches' output survives.
    import spark.implicits._
    val dir = tmp()
    def deliver(rows: Seq[Long], batchId: Long): Unit =
      rows.toDF("v").withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(s"$dir/out")
    deliver(Seq(1L, 2L, 3L), 0L)
    deliver(Seq(4L, 5L), 1L)
    deliver(Seq(4L, 5L), 1L) // crash-replay of batch 1
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 5, "replayed batch must not duplicate")
    assert(out.filter(col("batch_id") === 0).count() == 3,
      "dynamic overwrite must not clobber other batches")
  }

  test("streaming Avro sink: per-batch dirs make foreachBatch replay idempotent (WriteToAvro)") {
    // the Avro analogue of the parquet idempotent sink above: key the
    // output by batch id and let AvroIO.write's delete-then-write make
    // a crash-replayed batch land on top of its previous attempt —
    // exactly-once files under at-least-once foreachBatch, with other
    // batches' containers untouched. Shard bytes are deterministic
    // (sync marker from (dir, pid)), so the replay is byte-identical.
    import spark.implicits._
    import graft.sources.AvroIO
    val dir = tmp()
    def deliver(rows: Seq[Long], batchId: Long): Unit =
      AvroIO.write(rows.toDF("v"), s"$dir/out/batch-$batchId")
    deliver(Seq(1L, 2L, 3L), 0L)
    deliver(Seq(4L, 5L), 1L)
    deliver(Seq(4L, 5L), 1L) // crash-replay of batch 1
    val batches = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.toString).sorted
    assert(batches.length == 2)
    val out = batches.map(AvroIO.read(spark, _)).reduce(_ union _)
    assert(out.count() == 5, "replayed batch must not duplicate")
    assert(out.as[Long].collect().toSet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("evolved read reconciles renamed, added, and widened columns across vintages") {
    import graft.sources.EvolvedRead
    val dir = tmp()
    val docs = Tables.documents(spark, sf("sf0.001"))
    // vintage 0: original layout — `cents` INT, no `source` column
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") % 1000).cast("int").as("cents"))
      .write.parquet(s"$dir/v0")
    // vintage 1: `cents` renamed to `amount_cents` AND widened to LONG,
    // `source` added
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") % 1000).cast("long").as("amount_cents"), col("source"))
      .write.parquet(s"$dir/v1")
    val ev = EvolvedRead.read(spark, Seq(s"$dir/v0", s"$dir/v1"),
      renames = Seq(Map("cents" -> "amount_cents")), tagVintage = true)
    // reconciled schema: rename unified, type widened to LONG, add null-filled
    assert(ev.schema("amount_cents").dataType.typeName == "long")
    assert(ev.columns.toSeq == Seq("doc_id", "lang", "amount_cents", "source", "_vintage"))
    assert(ev.count() == docs.count())
    // old vintage rows carry NULL source; values survive the rename+cast
    assert(ev.filter(col("_vintage") === 0 && col("source").isNotNull).count() == 0)
    assert(ev.filter(col("source").isNull).count() ==
      docs.filter(col("doc_id") % 2 === 0).count())
    val expectSum = docs.agg(sum(col("n_chars") % 1000)).head().getLong(0)
    assert(ev.agg(sum(col("amount_cents"))).head().getLong(0) == expectSum)
    // irreconcilable types fail loudly at plan time
    docs.limit(5).select(col("doc_id"), col("lang").as("amount_cents"))
      .write.parquet(s"$dir/v2")
    val err = intercept[IllegalArgumentException] {
      EvolvedRead.read(spark, Seq(s"$dir/v0", s"$dir/v2"),
        renames = Seq(Map("cents" -> "amount_cents")))
    }
    assert(err.getMessage.contains("irreconcilable"))
  }

  test("evolved read: q147-shaped conflicting vintage (string measure) fails at plan time") {
    // the oracle-boundary failure path (r8 verdict #6): a vintage whose
    // measure column arrives as STRING must die loudly when the plan is
    // built — naming the vintage path, the column, and both types — not
    // null-fill rows mid-job
    import graft.sources.EvolvedRead
    val dir = tmp()
    val docs = Tables.documents(spark, sf("sf0.001")).limit(20)
    docs.select(col("doc_id"), (col("n_chars") % 1000).cast("float").as("value"))
      .write.parquet(s"$dir/v0")
    docs.select(col("doc_id"), col("lang").as("amount"))
      .write.parquet(s"$dir/v1")
    val err = intercept[IllegalArgumentException] {
      EvolvedRead.read(spark, Seq(s"$dir/v0", s"$dir/v1"),
        renames = Seq(Map.empty, Map("amount" -> "value")))
    }
    assert(err.getMessage.contains(s"vintage $dir/v1"))
    assert(err.getMessage.contains("column value"))
    assert(err.getMessage.contains("irreconcilable"))
    assert(err.getMessage.contains("string") && err.getMessage.contains("float"))
  }

  test("derived layouts build once: marker-gated reuse, half-written dirs rebuilt") {
    import graft.queries.Round8Queries.ensureScratch
    import org.apache.hadoop.fs.Path
    // a unique fixture-key string isolates this test's scratch dir
    val key = tmp() + "/fixture"
    var builds = 0
    def run(): String = ensureScratch(spark, "iospec", key) { b =>
      builds += 1
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(b))
      java.nio.file.Files.write(java.nio.file.Paths.get(b, "data.txt"),
        s"build $builds".getBytes)
    }
    val base = run()
    assert(builds == 1)
    run(); run()
    assert(builds == 1, "a completed layout must be reused, not rewritten per call")
    // half-written: marker gone but stale files present → wipe + rebuild
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(base, "_GRAFT_DONE"), false)
    fs.create(new Path(base, "stale-leftover.bin"), true).close()
    run()
    assert(builds == 2, "a marker-less dir is a failed build and must be rebuilt")
    assert(!fs.exists(new Path(base, "stale-leftover.bin")),
      "rebuild must wipe half-written leftovers, not merge with them")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base, "data.txt"))) == "build 2")
  }

  test("derived layouts rebuild when the build-recipe version changes") {
    import graft.queries.Round8Queries.ensureScratch
    // round-15 ADVICE: standing state is marker-gated per (tag, fixture)
    // — without a recipe fingerprint, an algorithm change would silently
    // keep serving scratch laid down by the OLD code. The version token
    // lives in the marker: same version reuses, changed version wipes
    // and rebuilds, and a legacy empty marker matches only the default.
    val key = tmp() + "/fixture-ver"
    var builds = 0
    def run(ver: String): Unit = {
      ensureScratch(spark, "iospecver", key, ver) { b =>
        builds += 1
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(b))
      }
      ()
    }
    run("K=5x1"); run("K=5x1")
    assert(builds == 1, "same version must reuse the standing layout")
    run("K=15x3")
    assert(builds == 2, "a changed recipe version must wipe and rebuild")
    run("K=15x3")
    assert(builds == 2)
    // legacy migration: a bare (empty) marker — the pre-round-16 form —
    // must NOT satisfy a versioned call
    run("")
    assert(builds == 3, "default version rebuilds over a versioned marker")
    run("K=15x3")
    assert(builds == 4, "versioned call rebuilds over a legacy empty marker")
  }

  test("binary payload survives a parquet round-trip") {
    val dir = tmp() + "/b"
    val df = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    df.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName == "binary")
    val diff = back.join(df.withColumnRenamed("payload", "orig"), "doc_id")
      .filter(col("payload") =!= col("orig")).count()
    assert(diff == 0)
  }
}
