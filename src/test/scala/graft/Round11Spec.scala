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

  test("OrcIO rejects top-level TIMESTAMP_NTZ at plan time (round-trip unpinned)") {
    import spark.implicits._
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts")
      .select(col("id"), col("ts").cast("timestamp_ntz").as("tsn"))
    val ex = intercept[IllegalArgumentException] {
      OrcIO.write(df, s"${tmp("graft_orc_ntz")}/t")
    }
    assert(ex.getMessage.contains("ORC_PRE_EPOCH") &&
      ex.getMessage.contains("TIMESTAMP_NTZ") && ex.getMessage.contains("'tsn'"))
  }

  test("guardPreEpoch leaves non-timestamp columns and clean plans untouched") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.5)).toDF("id", "s", "v")
    // no timestamp columns → the exact same plan object semantics
    assert(OrcIO.guardPreEpoch(df).collect().toSeq == df.collect().toSeq)
  }

  // --- q168 kNN graph --------------------------------------------------------

  test("q168 kNN graph: recall@5 >= 0.52 vs exact brute force, sims exact, degrees bounded") {
    val dir = sf("sf0.001")
    val vecs: Map[Long, Array[Double]] = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cosBp(a: Array[Double], b: Array[Double]): Long =
      math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 10000).toLong
    val out = SparkEntry.queries("q168_knn_graph")(spark, dir)
      .select("vec_id", "rn", "nb_id", "sim_bp").collect()
    // structural: every node appears, exactly 5 dense-ranked distinct
    // neighbors, never itself, and every sim is the exact cosine bp
    val byNode = out.groupBy(_.getLong(0))
    assert(byNode.keySet == vecs.keySet, "every corpus vector must get a neighbor list")
    byNode.foreach { case (a, rows) =>
      assert(rows.map(_.getAs[Number]("rn").intValue()).sorted.toSeq == (1 to 5),
        s"node $a: ranks must be dense 1..5")
      val nbs = rows.map(_.getLong(2))
      assert(nbs.distinct.length == 5 && !nbs.contains(a),
        s"node $a: neighbors must be 5 distinct non-self ids")
    }
    out.foreach(r => assert(r.getLong(3) == cosBp(vecs(r.getLong(0)), vecs(r.getLong(2))),
      s"sim_bp for ${r.getLong(0)}->${r.getLong(2)} diverges from exact cosine"))
    // recall floor vs EXACT brute-force top-5 (measured 0.5244 on the
    // fixture — the multi-table-seed + one-NN-descent-round quality,
    // sitting between q162's 0.425 and q163's 0.600 shortlist pins)
    val ids = vecs.keys.toSeq.sorted
    val exact: Map[Long, Set[Long]] = ids.map { a =>
      a -> ids.filter(_ != a)
        .map(bid => (cosBp(vecs(a), vecs(bid)), bid))
        .sortBy { case (s, bid) => (-s, bid) }.take(5).map(_._2).toSet
    }.toMap
    val hits = ids.map(a => (byNode(a).map(_.getLong(2)).toSet & exact(a)).size).sum
    val recall = hits.toDouble / (5.0 * ids.size)
    assert(recall >= 0.52, s"q168 recall@5 fell to $recall (floor 0.52)")
  }
}
