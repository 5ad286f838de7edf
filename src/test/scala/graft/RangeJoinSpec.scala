package graft

import org.apache.spark.sql.functions._
import graft.plans.{RangeJoin, RangeJoinExec}

/** The native interval-join physical operator (plans/RangeJoin.scala):
  * correctness vs brute force, edge semantics, plan shape. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points(rows: (Long, String)*) = rows.toDF("ts", "tag")
  private def ivals(rows: (Long, Long, Long)*) = rows.toDF("iid", "lo", "hi")

  test("matches the brute-force cross-join filter on fixture events") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), unix_micros(col("ts")).as("tus"), col("event_type"))
    val win = ev.filter(col("event_type") === "purchase" && col("event_id") % 100 === 0)
      .select(col("event_id").as("win_id"),
        (col("tus") - 3600000000L).as("ws"), (col("tus") + 3600000000L).as("we"))
    val fast = RangeJoin.joinRange(ev.select(col("event_id"), col("tus")), win,
        "tus", "ws", "we")
      .select(col("event_id"), col("win_id"))
    val brute = ev.select(col("event_id"), col("tus")).crossJoin(win)
      .filter(col("tus") >= col("ws") && col("tus") <= col("we"))
      .select(col("event_id"), col("win_id"))
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty,
      "native interval join must equal the brute-force pair set")
    assert(fast.count() > 0)
  }

  test("q117 equals q103's compositional bucket join on the shared columns") {
    val native = queries.ExtQueries.q117(spark, sf("sf0.001"))
      .select(col("win_id"), col("n_events"))
    val bucketed = queries.ExtQueries.q103(spark, sf("sf0.001"))
    assert(native.exceptAll(bucketed).isEmpty && bucketed.exceptAll(native).isEmpty)
  }

  test("an interval spanning every partition range matches each point exactly once") {
    // one wide interval duplicates into all ranges; each point lives in
    // one range, so no output duplication is possible by construction —
    // assert it anyway
    val p = points((1L to 1000L).map(i => (i, s"p$i")): _*)
    val i = ivals((7L, Long.MinValue / 4, Long.MaxValue / 4))
    val out = RangeJoin.joinRange(p, i, "ts", "lo", "hi")
    assert(out.count() === 1000)
    assert(out.groupBy(col("ts")).count().filter(col("count") > 1).count() === 0)
  }

  test("null ts / null bounds / inverted intervals match nothing") {
    val p = Seq((Some(5L), "a"), (None, "null-ts")).toDF("ts", "tag")
    val i = Seq(
      (1L, Some(0L), Some(10L)),   // matches ts=5
      (2L, None, Some(10L)),       // null lo: never matches
      (3L, Some(0L), None),        // null hi: never matches
      (4L, Some(10L), Some(0L)))   // inverted: never matches
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.joinRange(p, i, "ts", "lo", "hi").select(col("tag"), col("iid"))
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 1L)))
  }

  test("empty sides produce empty output, not a crash") {
    val p = points((1L, "a"))
    val none = ivals()
    assert(RangeJoin.joinRange(p, none, "ts", "lo", "hi").count() === 0)
    assert(RangeJoin.joinRange(points(), ivals((1L, 0L, 10L)), "ts", "lo", "hi").count() === 0)
  }

  test("boundary inclusivity: lo and hi both match") {
    val p = points((0L, "at-lo"), (10L, "at-hi"), (11L, "past-hi"))
    val i = ivals((1L, 0L, 10L))
    val got = RangeJoin.joinRange(p, i, "ts", "lo", "hi")
      .select(col("tag")).as[String].collect().toSet
    assert(got === Set("at-lo", "at-hi"))
  }

  test("identical-ts skew (degenerate single range) still joins correctly") {
    val p = points((1L to 500L).map(_ => (42L, "x")): _*)
    val i = ivals((1L, 40L, 44L), (2L, 100L, 200L))
    val out = RangeJoin.joinRange(p, i, "ts", "lo", "hi")
    assert(out.count() === 500)
  }

  test("randomized: equals brute force on seeded adversarial distributions") {
    // three seeded shapes: uniform, heavy ts clusters (many equal keys
    // straddling range bounds), and mixed-width intervals (point-width
    // through corpus-width) — the configurations where a partition-edge
    // or duplication bug would hide
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val pts = (1 to 2000).map { i =>
        val ts = seed match {
          case 1 => rnd.nextLong() % 100000
          case 2 => (rnd.nextInt(20) * 5000).toLong // 20 hot values
          case _ => rnd.nextLong() % 1000
        }
        (ts, s"p$i")
      }
      val ivs = (1 to 300).map { i =>
        val lo = rnd.nextLong() % 100000
        val width = seed match {
          case 3 => math.abs(rnd.nextLong()) % 200000 // corpus-spanning
          case _ => math.abs(rnd.nextLong()) % 10000
        }
        (i.toLong, lo, lo + width)
      }
      val p = points(pts: _*)
      val i = ivals(ivs: _*)
      val fast = RangeJoin.joinRange(p, i, "ts", "lo", "hi")
        .select(col("tag"), col("iid"))
      val brute = p.crossJoin(i)
        .filter(col("ts") >= col("lo") && col("ts") <= col("hi"))
        .select(col("tag"), col("iid"))
      assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty,
        s"seed=$seed: native interval join diverges from brute force")
    }
  }

  test("q117 hot window: one window owning 200k distinct users aggregates exactly (the collect_set bound)") {
    // The q117 scaladoc's spill-safety argument, pinned (round-16
    // verdict #6): the distinct-user set buffer of ONE window is bounded
    // by that window's event count — the same magnitude as the window's
    // own join output, never corpus-sized. A deliberately hot window
    // (200k events, 150k distinct users, far beyond any fixture window)
    // must aggregate exactly through the q117 shape: RangeJoinExec into
    // groupBy(win_id).agg(count, size(collect_set)). 150k longs ≈ 1.2 MB
    // of buffer — the documented bound in action; a corpus-hot window
    // beyond task memory calls for the q60-style two-level split, which
    // the scaladoc names as the escalation.
    val n = 200000L
    val pts = spark.range(n).select(
      (col("id") % 150000L).as("user_id"),   // 150k distinct users
      (col("id") % 1000L).as("tus"))         // all inside the window
    val win = Seq((7L, 0L, 1000L)).toDF("win_id", "ws", "we")
    val out = plans.RangeJoin.joinRange(pts, win, "tus", "ws", "we")
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_events"),
        size(collect_set(col("user_id"))).cast("long").as("n_users"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == n, s"n_events: ${out(0).getLong(1)}")
    assert(out(0).getLong(2) == 150000L, s"n_users: ${out(0).getLong(2)}")
  }

  test("plan uses RangeJoinExec, never BroadcastNestedLoopJoin") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
    val win = ivals((1L, 0L, Long.MaxValue / 2))
    val df = RangeJoin.joinRange(ev, win, "tus", "lo", "hi")
    val plan = df.queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[RangeJoinExec]), plan.toString)
    assert(!plan.toString.contains("BroadcastNestedLoop"), plan.toString)
  }

  test("the aggregation above the exec fuses into ONE codegen stage (round 16)") {
    // the q117 shape: pairs feed a partial aggregate. With CodegenSupport
    // on RangeJoinExec the generated processNext drives the sweep and the
    // aggregate update in the same loop — no per-pair row materialization
    // (round-15 sf10 measured that boundary at 2.4x the fused form). The
    // assertion pins the collapsed stage: some WholeStageCodegen subtree
    // contains BOTH the exec and a HashAggregate above it.
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
    val win = ev.filter(col("event_id") % 100 === 0)
      .select(col("event_id").as("win_id"),
        (col("tus") - 3600000000L).as("ws"), (col("tus") + 3600000000L).as("we"))
    val agg = RangeJoin.joinRange(ev.select(col("user_id"), col("tus")), win,
        "tus", "ws", "we")
      .groupBy(col("win_id")).agg(count(lit(1)).as("n"))
    agg.collect() // materialize THIS QueryExecution so AQE finalizes it
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val finalPlan = agg.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE hides WholeStageCodegenExec nodes inside QueryStageExec leaf
    // wrappers, so assert on the rendered stage markers: the join line
    // and the PARTIAL aggregate line must carry the same `*(k)` id —
    // one collapsed codegen stage, no InputAdapter boundary between
    val lines = finalPlan.toString.linesIterator.toSeq
    def stageOf(marker: String): Option[String] =
      lines.find(_.contains(marker))
        .flatMap(l => """\*\((\d+)\)""".r.findFirstMatchIn(l).map(_.group(1)))
    val joinStage = stageOf("RangeJoin")
    val partialAggStage = stageOf("partial_count")
    assert(joinStage.isDefined && joinStage == partialAggStage,
      s"expected RangeJoinExec fused into the partial aggregate's codegen " +
        s"stage, got join=$joinStage agg=$partialAggStage in:\n$finalPlan")
  }

  test("self-join on a shared scan does not collide exprIds") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
    val win = ev.select(col("event_id").as("iid"),
      (col("tus") - 1000000L).as("lo"), (col("tus") + 1000000L).as("hi"))
    // every event matches at least its own ±1s window
    val out = RangeJoin.joinRange(ev, win, "tus", "lo", "hi")
    assert(out.filter(col("event_id") === col("iid")).count() === ev.count())
  }
}
