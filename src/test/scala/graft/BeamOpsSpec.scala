package graft

import org.apache.spark.sql.functions._
import graft.dsl.BeamOps._

/** Equivalence pins for the Beam-vocabulary veneer (graft.dsl.BeamOps):
  * each method must produce the same result as the Spark-native form it
  * delegates to, on real fixture data — the veneer adds naming, never
  * semantics. Plus the plan-economics claims: combinePerKey partials
  * combine map-side (ObjectHashAggregate/SortAggregate with partial
  * merge, not a GBK materialization). */
class BeamOpsSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def events = {
    val s = spark; import s.implicits._
    Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, String, Double)]
  }

  test("parDo / mapElements / filterElements equal flatMap / map / filter") {
    val s = spark; import s.implicits._
    val viaDsl = events.parDo(e => e._3.split("_").toSeq)
      .mapElements(_.toUpperCase).filterElements(_.nonEmpty)
      .collect().sorted.toSeq
    val viaSpark = events.flatMap(_._3.split("_").toSeq)
      .map(_.toUpperCase).filter(_.nonEmpty)
      .collect().sorted.toSeq
    assert(viaDsl == viaSpark && viaDsl.nonEmpty)
  }

  test("withKeys + groupByKeyBeam materializes exactly the per-key multisets") {
    val s = spark; import s.implicits._
    val gbk = events.withKeys(_._3).groupByKeyBeam
      .collect().map { case (k, vs) => k -> vs.map(_._1).sorted }.toMap
    val expected = Tables.events(spark, sf("sf0.001"))
      .groupBy(col("event_type")).agg(sort_array(collect_list(col("event_id"))).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(gbk == expected)
  }

  test("combinePerKey(0L)(+) equals groupBy.count and partial-aggregates map-side") {
    val s = spark; import s.implicits._
    val cpk = events.withKeys(_._3).combinePerKey(0L)((a, _) => a + 1, _ + _)
    val got = cpk.collect().toMap
    val expected = Tables.events(spark, sf("sf0.001"))
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // the CombineFn must LIFT: a partial aggregate below the exchange
    // (Beam's combiner lifting), never a GBK-style full materialization
    val plan = cpk.queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"), s"no aggregate in plan:\n$plan")
    assert(!plan.contains("MapGroups"), s"combinePerKey must not plan MapGroups:\n$plan")
  }

  test("coGroupByKeyBeam equals two grouped sides") {
    val s = spark; import s.implicits._
    val left = events.filterElements(_._4 > 250).withKeys(_._3)
    val right = events.filterElements(_._4 <= 250).withKeys(_._3)
    val cg = left.coGroupByKeyBeam(right)
      .collect().map { case (k, l, r) => k -> (l.length, r.length) }.toMap
    val lc = left.collect().groupBy(_._1).view.mapValues(_.length).toMap
    val rc = right.collect().groupBy(_._1).view.mapValues(_.length).toMap
    val allKeys = lc.keySet ++ rc.keySet
    assert(cg == allKeys.map(k => k -> (lc.getOrElse(k, 0), rc.getOrElse(k, 0))).toMap)
  }

  test("topPerKey(3) equals the window row_number form") {
    val s = spark; import s.implicits._
    val top = events.withKeys(_._3)
      .topPerKey(3)(Ordering.by((e: (Long, Long, String, Double)) => (e._4, -e._1)),
        implicitly, implicitly, implicitly)
      .collect().map { case (k, vs) => k -> vs.map(_._1) }.toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
    val expected = Tables.events(spark, sf("sf0.001"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("event_type"), col("rn"), col("event_id"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    assert(top == expected)
  }

  test("latestPerKey equals max_by on the same order") {
    val s = spark; import s.implicits._
    val latest = events.withKeys(_._2)
      .latestPerKey(_._1) // event_id is monotone with ingestion in the fixture
      .collect().map { case (k, v) => k -> v._1 }.toMap
    val expected = Tables.events(spark, sf("sf0.001"))
      .groupBy(col("user_id")).agg(max(col("event_id")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == expected)
  }

  test("partitionInto routes every element to exactly one output") {
    val s = spark; import s.implicits._
    val parts = events.partitionInto(3)(e => (e._1 % 3).toInt)
    val sizes = parts.map(_.count()).toSeq
    assert(sizes.sum == events.count())
    val ids = parts.flatMap(_.collect().map(_._1).toSeq)
    assert(ids.distinct.length == ids.length)
  }

  test("parDoWithSideInput broadcasts the side list to every element") {
    val s = spark; import s.implicits._
    val side = Seq("click", "purchase").toDS()
    val kept = events.parDoWithSideInput(side) { (e, allowed) =>
      if (allowed.contains(e._3)) Some(e._1) else None
    }.count()
    val expected = Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type").isin("click", "purchase")).count()
    assert(kept == expected && kept > 0)
  }

  test("parDoWithOutputs routes each element to exactly one tag") {
    val s = spark; import s.implicits._
    val (big, small, done) = events.parDoWithOutputs(e =>
      (if (e._4 > 250) 0 else 1, e._1))
    try {
      assert(big.count() + small.count() == events.count())
      val ids = (big.collect() ++ small.collect()).toSeq
      assert(ids.distinct.length == ids.length)
    } finally done()
  }

  test("parDoWithDictSideInput broadcasts the keyed side as a map") {
    val s = spark; import s.implicits._
    val rates = Seq(("click", 1L), ("purchase", 10L), ("view", 0L)).toDS()
    val scored = events.parDoWithDictSideInput(rates) { (e, dict) =>
      Some(dict.getOrElse(e._3, -1L))
    }
    val got = scored.collect()
    assert(got.length == events.count())
    val expectedTen = Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type") === "purchase").count()
    assert(got.count(_ == 10L) == expectedTen && expectedTen > 0)
    // event types outside the dict hit the default, proving per-element
    // lookup (not a join that would drop them)
    assert(got.contains(-1L))
  }

  test("windowIntoFixed/Sliding/Sessions equal the column-form window queries q21/q22/q23") {
    // the ported-pipeline spelling of each windowed query must be
    // row-identical to the oracle-green column form
    import graft.util.Det._
    val d = sf("sf0.001")
    val ev = Tables.events(spark, d)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq

    val fixedVeneer = ev.windowIntoFixed("ts", "1 day", col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("w_start_us"), col("event_type"))
    assert(rows(fixedVeneer) == rows(
      graft.queries.WindowQueries.q21(spark, d)) && rows(fixedVeneer).nonEmpty)

    val slidingVeneer = ev.windowIntoSliding("ts", "2 days", "1 day")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("n"), col("sum_value"))
      .orderBy(col("w_start_us"))
    assert(rows(slidingVeneer) == rows(graft.queries.WindowQueries.q22(spark, d)))

    val sessionVeneer = ev.windowIntoSessions("ts", lit("12 hours"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("s_start_us"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("s_start_us"))
    assert(rows(sessionVeneer) == rows(graft.queries.WindowQueries.q23(spark, d)))
  }

  test("q154 (wordcount through the veneer) equals q03 and still map-side combines") {
    val d = sf("sf0.001")
    val viaVeneer = graft.queries.Round9Queries.q154(spark, d)
    val viaColumns = graft.queries.RelationalQueries.q03(spark, d)
      .withColumnRenamed("word", "word")
    assert(viaVeneer.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      viaColumns.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
    // the oracle-checked veneer pipeline keeps combiner lifting: partial
    // aggregation below the exchange, no GBK materialization
    val plan = viaVeneer.queryExecution.executedPlan.toString
    assert(!plan.contains("MapGroups"),
      s"veneer wordcount must not plan MapGroups:\n$plan")
  }

  test("flattenWith / distinctElements / reshuffle / keys / values / kvSwap") {
    val s = spark; import s.implicits._
    val a = events.filterElements(_._1 % 2 == 0)
    val b = events.filterElements(_._1 % 2 == 1)
    assert(a.flattenWith(b).count() == events.count())
    val kv = events.withKeys(_._3)
    assert(kv.keys.distinctElements.count() == 5)
    assert(kv.values.count() == events.count())
    assert(kv.kvSwap.mapElements(_._2).distinctElements.count() == 5)
    assert(events.reshuffle(7).rdd.getNumPartitions == 7)
    assert(events.reshuffle(7).count() == events.count())
  }
}
