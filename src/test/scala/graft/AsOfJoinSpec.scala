package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** The custom as-of join operator (logical node + strategy + physical
  * merge sweep) against the compositional union+window form (q25) and
  * hand-built edge cases. */
class AsOfJoinSpec extends SparkSpec {

  test("as-of join operator equals the compositional window form on real events") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("tus"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), col("tus").as("click_tus"))
    val joined = AsOfJoin.joinAsOf(purchases, clicks, "user_id", "tus", Seq("click_tus"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"as-of join must not fall back to a loop join:\n$plan")
    val got = joined.select(col("event_id"), col("user_id"), col("tus"), col("click_tus"))
      .orderBy(col("event_id")).collect().map(_.toSeq).toSeq
    val want = graft.queries.ExtQueries.q25(spark, sf("sf0.001"))
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"got ${got.size} rows, want ${want.size}")
    assert(got.nonEmpty && got.exists(_.last != null))
  }

  test("as-of join edge cases: no prior match, equal timestamps, key without right rows") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // before any right row for key 1 -> null
      (1L, 101L, 20L), // equal ts matches (<=)
      (1L, 102L, 35L), // takes the LATEST prior, not the first
      (2L, 103L, 50L)  // key 2 has no right rows at all -> null
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, 20L, 920L),
      (1L, 30L, 930L)
    ).toDF("k", "t", "payload")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", Seq("payload"))
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(out == Seq((100L, -1L), (101L, 920L), (102L, 930L), (103L, -1L)))
  }

  test("as-of join ties on (key, ts) resolve deterministically to the greatest payload") {
    import spark.implicits._
    val left = Seq((1L, 100L, 25L)).toDF("k", "id", "t")
    // three right rows with IDENTICAL (key, ts) and different payloads —
    // before the payload tiebreak joined the required child ordering,
    // which of them survived the one-row sweep buffer depended on
    // partition-internal sort luck; now the greatest payload tuple wins
    val right = Seq((1L, 20L, 910L), (1L, 20L, 930L), (1L, 20L, 920L))
      .toDF("k", "t", "payload")
      .repartition(4) // scramble the incoming order on purpose
    (1 to 3).foreach { _ =>
      val out = AsOfJoin.joinAsOf(left, right, "k", "t", Seq("payload"))
        .collect().map(_.getLong(3)).toSeq
      assert(out == Seq(930L), s"tie must pick the greatest payload, got $out")
    }
  }
}
