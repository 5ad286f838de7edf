package graft

import org.apache.spark.sql.functions._
import graft.sources.OrcIO

/** Round-11 operator specs: the guarded ORC sink (the behavioral close
  * of the pre-epoch trap Round10Spec pins as raw-Spark behavior). */
class Round11Spec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("OrcIO.write rejects timestamps in the (-1s, 0) pre-epoch window with ORC_PRE_EPOCH") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123456")),
      (2L, new java.sql.Timestamp(-250L)) // 1969-12-31 23:59:59.750 — the trap window
    ).toDF("id", "ts")
    val ex = intercept[Exception] { OrcIO.write(df, s"${tmp("graft_orc_guard")}/t") }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("ORC_PRE_EPOCH")),
      s"expected a named ORC_PRE_EPOCH failure, got: $ex")
  }

  test("OrcIO.write round-trips post-epoch and deeper pre-epoch timestamps exactly") {
    import spark.implicits._
    // values straddling the guarded window on both sides: exactly the
    // epoch, exactly -1s (both OUTSIDE the exclusive window), deeper
    // pre-epoch, and ordinary post-epoch
    val rows = Seq(
      (1L, new java.sql.Timestamp(0L)),        // 1970-01-01 00:00:00.000
      (2L, new java.sql.Timestamp(-1000L)),    // 1969-12-31 23:59:59.000 exactly
      (3L, java.sql.Timestamp.valueOf("1969-12-31 23:59:58.250")),
      (4L, java.sql.Timestamp.valueOf("1960-06-01 12:00:00.123456")),
      (5L, java.sql.Timestamp.valueOf("2031-01-02 03:04:05.678901")))
    val df = rows.toDF("id", "ts")
    val path = s"${tmp("graft_orc_ok")}/t"
    OrcIO.write(df, path)
    val back = spark.read.orc(path).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(back.toSeq == rows.sortBy(_._1),
      s"guarded ORC write must be value-transparent outside the window")
  }

  test("OrcIO rejects NESTED timestamps at plan time rather than passing them unguarded") {
    import spark.implicits._
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts")
      .select(col("id"), struct(col("ts").as("inner")).as("s"))
    val ex = intercept[IllegalArgumentException] {
      OrcIO.write(df, s"${tmp("graft_orc_nested")}/t")
    }
    assert(ex.getMessage.contains("ORC_PRE_EPOCH") && ex.getMessage.contains("'s'"))
  }

  test("guardPreEpoch leaves non-timestamp columns and clean plans untouched") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.5)).toDF("id", "s", "v")
    // no timestamp columns → the exact same plan object semantics
    assert(OrcIO.guardPreEpoch(df).collect().toSeq == df.collect().toSeq)
  }
}
