package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** TFRecord source/sink — Beam Python's `ReadFromTFRecord` /
  * `WriteToTFRecord` (io/tfrecordio.py), the interchange format every
  * TF-based training pipeline consumes, implemented from the PUBLIC
  * on-disk spec (TensorFlow's record format documentation):
  *
  *   uint64 length (little-endian)
  *   uint32 masked_crc32c(length bytes)
  *   byte   data[length]
  *   uint32 masked_crc32c(data)
  *
  * with masked_crc = rotr15(crc32c) + 0xa282ead8 (mod 2^32); CRC32C is
  * the JDK's `java.util.zip.CRC32C` (Castagnoli). IoSpec pins the
  * framing against independently computed golden bytes, so a masking or
  * endianness slip cannot silently round-trip.
  *
  * Scale shape: one .tfrecord file per input partition on write (the
  * layout TF sharding expects — at 100 TB you want thousands of shard
  * files, which is exactly partition count), and one read task per file
  * on read. TFRecord frames carry no sync markers, so a single file is
  * NOT splittable without an external index — the parallel unit is the
  * file, which is why the writer never concatenates partitions. Records
  * stream through both directions (constant memory per task); a
  * corrupt length or CRC fails loudly with the file and offset rather
  * than yielding silently truncated data.
  */
object TFRecordIO {

  private val HeaderLen = 12 // 8-byte length + 4-byte masked length-crc
  private val MaskDelta = 0xa282ead8L

  private[graft] def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C
    c.update(bytes)
    val crc = c.getValue // unsigned 32-bit in a long
    val rot = ((crc >>> 15) | (crc << 17)) & 0xFFFFFFFFL
    ((rot + MaskDelta) & 0xFFFFFFFFL).toInt
  }

  private def le64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Frame one record (public API so the spec can golden-test it). */
  private[graft] def frame(data: Array[Byte]): Array[Byte] = {
    val len = le64(data.length.toLong)
    val out = ByteBuffer.allocate(HeaderLen + data.length + 4)
    out.put(len).put(le32(maskedCrc(len))).put(data).put(le32(maskedCrc(data)))
    out.array()
  }

  /** Write `df`'s single binary column as one .tfrecord file per
    * partition under `dir` (overwrites). */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    require(schema.length == 1 && schema.head.dataType == BinaryType,
      s"TFRecordIO.write expects exactly one binary column, got ${schema.simpleString}")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    root.getFileSystem(conf.value).delete(root, true)
    df.rdd.foreachPartition { rows =>
      // TaskContext gives the shard index; an empty partition still
      // writes its (empty) shard so the file set is dense and stable.
      // Commit protocol (Beam's sink pattern): stream to a task-attempt
      // temp file, rename into place on success — under speculative
      // execution or a zombie first attempt, two attempts never write
      // the same final path concurrently; content is deterministic per
      // partition, so whichever attempt wins the rename is correct and
      // the loser just deletes its temp.
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val fin = new Path(dir, f"part-$pid%05d.tfrecord")
      val tmp = new Path(dir, f".part-$pid%05d.tfrecord.attempt-${tc.taskAttemptId()}")
      val fs = fin.getFileSystem(conf.value)
      val out = new BufferedOutputStream(fs.create(tmp, true))
      var ok = false
      try {
        rows.foreach { r =>
          val data = r.getAs[Array[Byte]](0)
          out.write(frame(if (data == null) Array.emptyByteArray else data))
        }
        ok = true
      } finally {
        out.close()
        if (!ok) fs.delete(tmp, false)
      }
      if (!fs.rename(tmp, fin)) {
        // dest already committed by another attempt (same bytes) — or
        // something is genuinely wrong; only the former is tolerable
        if (fs.exists(fin)) fs.delete(tmp, false)
        else throw new java.io.IOException(s"TFRecordIO: commit rename failed for $fin")
      }
    }
  }

  /** Read every .tfrecord file under `dir` as a one-binary-column
    * frame (`record`), one task per file, CRCs verified. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val files = root.getFileSystem(conf.value).globStatus(new Path(root, "*.tfrecord"))
      .map(_.getPath.toString).sorted
    val rdd = spark.sparkContext.parallelize(files.toSeq, math.max(files.length, 1))
      .flatMap { file =>
        val path = new Path(file)
        val in = new DataInputStream(new BufferedInputStream(
          path.getFileSystem(conf.value).open(path)))
        // the stream must not outlive the task whatever happens: a
        // CRC/length IOException below, or a consumer that stops early
        // (limit/take) and never drains the iterator, would otherwise
        // leak the handle for the executor's lifetime
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        new Iterator[Row] {
          private var nextRec: Array[Byte] = advanceClosing()
          private var offset = 0L
          private def advanceClosing(): Array[Byte] =
            try advance()
            catch { case e: Throwable => in.close(); throw e }
          private def readN(n: Int): Array[Byte] = {
            val buf = new Array[Byte](n)
            in.readFully(buf); offset += n; buf
          }
          private def advance(): Array[Byte] = {
            // distinguish a clean end-of-file (0 bytes left) from a
            // TRUNCATED header: only the former may end the stream
            // quietly; readFully throwing EOFException below surfaces
            // the latter as the corruption it is
            val first = in.read()
            if (first < 0) { in.close(); return null }
            val lenBytes = new Array[Byte](8)
            lenBytes(0) = first.toByte
            in.readFully(lenBytes, 1, 7)
            offset += 8
            val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getLong
            val lenCrc = ByteBuffer.wrap(readN(4)).order(ByteOrder.LITTLE_ENDIAN).getInt
            if (lenCrc != maskedCrc(lenBytes))
              throw new java.io.IOException(s"$file: corrupt length CRC at offset ${offset - 12}")
            if (len < 0 || len > Int.MaxValue - 16)
              throw new java.io.IOException(s"$file: implausible record length $len at offset ${offset - 12}")
            val data = readN(len.toInt)
            val dataCrc = ByteBuffer.wrap(readN(4)).order(ByteOrder.LITTLE_ENDIAN).getInt
            if (dataCrc != maskedCrc(data))
              throw new java.io.IOException(s"$file: corrupt data CRC at offset ${offset - 4}")
            data
          }
          override def hasNext: Boolean = nextRec != null
          override def next(): Row = {
            val r = nextRec
            nextRec = advanceClosing()
            Row(r)
          }
        }
      }
    spark.createDataFrame(rdd,
      StructType(Seq(StructField("record", BinaryType, nullable = false))))
  }
}
