package graft

import org.apache.spark.sql.functions._

/** Pins what the ENGINE reads from the fixtures against externally
  * recorded ground truth (DuckDB reads of the same parquet, recorded
  * 2026-08-13). The round-5 regression — fixtures silently regenerated
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS), collapsing the engine's
  * event timeline 1000× while every query still "ran green" locally —
  * lived for hours because nothing engine-side asserted what the
  * fixtures actually contain. This spec makes the next silent fixture
  * regeneration fail loudly in `sbt test` instead of in the
  * correctness gate.
  *
  * If a fixture regeneration legitimately changes these values, the
  * fix is to re-record the manifest below from DuckDB (not to relax
  * the assertions).
  */
class FixtureProbeSpec extends SparkSpec {

  // DuckDB: SELECT count(*) FROM '<sf>/<table>.parquet'
  private val rowCounts = Map(
    "sf0.001" -> Map(
      "region" -> 5L, "nation" -> 25L, "customer" -> 150L,
      "supplier" -> 10L, "part" -> 200L, "orders" -> 1500L,
      "lineitem" -> 6000L, "events" -> 1000L,
      "documents" -> 500L, "embeddings" -> 500L),
    "sf0.01" -> Map(
      "region" -> 5L, "nation" -> 25L, "customer" -> 1500L,
      "supplier" -> 100L, "part" -> 2000L, "orders" -> 15000L,
      "lineitem" -> 60000L, "events" -> 10000L,
      "documents" -> 500L, "embeddings" -> 500L))

  for ((sfName, tables) <- rowCounts; (table, expected) <- tables)
    test(s"$sfName/$table row count matches the DuckDB-recorded manifest ($expected)") {
      assert(Tables.load(spark, sf(sfName), table).count() === expected)
    }

  // DuckDB: SELECT min(ts), max(ts), count(DISTINCT user_id) FROM events
  //   sf0.001: 2024-01-01 00:09:58.778549 .. 2024-01-30 23:26:16.220708, 15 users
  //   sf0.01:  2024-01-01 00:00:07.179575 .. 2024-01-30 23:57:12.194062, 150 users
  private val eventsManifest = Map(
    "sf0.001" -> ("2024-01-01 00:09:58.778549", "2024-01-30 23:26:16.220708", 15L),
    "sf0.01" -> ("2024-01-01 00:00:07.179575", "2024-01-30 23:57:12.194062", 150L))

  for ((sfName, (minTs, maxTs, users)) <- eventsManifest)
    test(s"$sfName/events: engine ts min/max/users match DuckDB exactly ($minTs..$maxTs)") {
      val row = Tables.events(spark, sf(sfName))
        .agg(
          date_format(min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("lo"),
          date_format(max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("hi"),
          countDistinct("user_id").as("users"))
        .head()
      assert(row.getString(0) === minTs)
      assert(row.getString(1) === maxTs)
      assert(row.getLong(2) === users)
    }

  test("events ts spans ~30 days, not minutes (the unit-mismatch canary)") {
    val row = Tables.events(spark, sf("sf0.001"))
      .agg((unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("span"))
      .head()
    val days = row.getLong(0) / 86400.0
    assert(days > 25 && days < 35, s"event span is $days days — timestamp unit mismatch?")
  }

  test("events schema: ts is TimestampType, value is Double, props is String") {
    val schema = Tables.events(spark, sf("sf0.001")).schema
    import org.apache.spark.sql.types._
    assert(schema("ts").dataType === TimestampType)
    assert(schema("event_id").dataType === LongType)
    assert(schema("user_id").dataType === LongType)
    assert(schema("event_type").dataType === StringType)
    assert(schema("value").dataType === DoubleType)
    assert(schema("props").dataType === StringType)
  }

  test("orders.o_custkey -> customer FK holds (q11's top-10-before-join cut relies on it)") {
    // q11 takes top-10 per-customer revenue BEFORE joining the customer
    // dimension (RelationalQueries.scala q11), which equals the
    // join-then-sort shape ONLY if every o_custkey resolves. A fixture
    // vintage with dangling custkeys would silently shrink the result;
    // this pin makes that fail loudly here instead.
    for (sfName <- Seq("sf0.001", "sf0.01")) {
      val orphans = Tables.orders(spark, sf(sfName))
        .join(Tables.customer(spark, sf(sfName)),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .count()
      assert(orphans === 0L, s"$sfName: orders has $orphans dangling o_custkey rows")
    }
  }

  test("eventsTsUnit reports the footer annotation for the current fixtures") {
    // Current vintage is MICROS; if this fails after a regeneration,
    // events() must still read correctly (the min/max tests above are
    // the real contract) — update this pin to the new unit.
    assert(Tables.eventsTsUnit(spark, sf("sf0.001") + "/events.parquet") === "MICROS")
    // A directory/nonexistent path degrades to NATIVE (plain read).
    assert(Tables.eventsTsUnit(spark, sf("sf0.001")) === "NATIVE")
  }
}
