package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming
import graft.streaming.Streaming.Ev

/** End-to-end stream≡batch HASH parity for the window family on the
  * REAL sf0.001 fixture (1 000 events, ns-born timestamps, 15 users,
  * 30 days) — the same evidence standard as the DuckDB oracle, not toy
  * rows: the MemoryStream is fed the exact parquet rows of the
  * oracle-checked batch queries (q21 tumbling / q22 sliding /
  * q23 sessions / q102 dynamic-gap sessions) in event-time order
  * across several micro-batches, the watermark is pushed past the end,
  * and the appended stream output must hash IDENTICAL (md5 over the
  * canonically-ordered rows, exact doubles included) to the batch
  * result the driver verifies against DuckDB. This closes Beam's
  * batch/stream-unification claim for windowing: one definition, two
  * runtimes, bit-equal output.
  *
  * Feeding order note: rows are sorted by (ts, event_id) before
  * chunking, so with a 0-second watermark no row is ever late — any
  * open window's end strictly exceeds the watermark when its next row
  * arrives. Out-of-order handling (late drops) is spec'd separately in
  * StreamingSpec; THIS spec isolates the aggregation-parity claim.
  */
class StreamBatchParitySpec extends SparkSpec {

  private val SF = "sf0.001"
  private val Chunks = 5
  // any window at/after 2029 belongs to the watermark-driver sentinel
  private val SentinelBoundUs = Timestamp.valueOf("2029-01-01 00:00:00").getTime * 1000L
  private val sentinel = Ev(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "zz", 0.0)

  private lazy val fixtureRows: Seq[Ev] = {
    val rows = Tables.events(spark, sf(SF))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    rows.sortBy(e => (e.ts.getTime, e.event_id))
  }

  private def md5(rows: Seq[org.apache.spark.sql.Row]): String = {
    val s = rows.map(_.mkString("|")).mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Stream `fixtureRows` through `transform` in Chunks micro-batches +
    * a far-future sentinel, return the appended output table. */
  private def streamed(name: String,
                       transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = transform(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val chunkSize = (fixtureRows.length + Chunks - 1) / Chunks
    fixtureRows.grouped(chunkSize).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    mem.addData(sentinel); q.processAllAvailable()
    mem.addData(sentinel.copy(event_id = -2L,
      ts = Timestamp.valueOf("2031-01-01 00:00:00")))
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("q21 tumbling windows: stream output hashes identical to the oracle-checked batch result") {
    val stream = streamed("p_q21",
        df => Streaming.tumblingCounts(df, watermark = Some("0 seconds")))
      .filter(col("w_start_us") < SentinelBoundUs)
      .orderBy(col("w_start_us"), col("event_type"))
      .collect().toSeq
    val batch = SparkEntry.queries("q21_window_tumbling")(spark, sf(SF)).collect().toSeq
    assert(stream.nonEmpty && md5(stream) == md5(batch),
      s"tumbling parity broke: stream=${stream.take(3)}... batch=${batch.take(3)}...")
  }

  test("q22 sliding windows: stream output hashes identical to the oracle-checked batch result") {
    val stream = streamed("p_q22",
        df => Streaming.slidingCounts(df, watermark = Some("0 seconds")))
      .filter(col("w_start_us") < SentinelBoundUs)
      .orderBy(col("w_start_us"))
      .collect().toSeq
    val batch = SparkEntry.queries("q22_window_sliding")(spark, sf(SF)).collect().toSeq
    assert(stream.nonEmpty && md5(stream) == md5(batch),
      s"sliding parity broke: stream=${stream.take(3)}... batch=${batch.take(3)}...")
  }

  test("q23 session windows: stream output hashes identical to the oracle-checked batch result") {
    val stream = streamed("p_q23",
        df => Streaming.sessionCounts(df, watermark = Some("0 seconds")))
      .filter(col("user_id") >= 0)
      .orderBy(col("user_id"), col("s_start_us"))
      .collect().toSeq
    val batch = SparkEntry.queries("q23_window_session")(spark, sf(SF)).collect().toSeq
    assert(stream.nonEmpty && md5(stream) == md5(batch),
      s"session parity broke: stream=${stream.take(3)}... batch=${batch.take(3)}...")
  }

  test("q102 dynamic-gap sessions: stream output hashes identical to the oracle-checked batch result") {
    val stream = streamed("p_q102",
        df => Streaming.dynSessionCounts(df, watermark = Some("0 seconds")))
      .filter(col("user_id") >= 0)
      .orderBy(col("user_id"), col("s_start_us"))
      .collect().toSeq
    val batch = SparkEntry.queries("q102_dynamic_session")(spark, sf(SF)).collect().toSeq
    assert(stream.nonEmpty && md5(stream) == md5(batch),
      s"dynamic-session parity broke: stream=${stream.take(3)}... batch=${batch.take(3)}...")
  }
}
