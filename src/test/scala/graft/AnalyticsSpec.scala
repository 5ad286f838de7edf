package graft

import graft.queries.AnalyticsQueries

/** Semantic invariants for the product-analytics wave (q97–q101). */
class AnalyticsSpec extends SparkSpec {

  private def d = sf("sf0.001")

  test("q125: transition mass balances and per-source probabilities are a floor-partition of 1000") {
    val rows = AnalyticsQueries.q125(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 25, s"${rows.length} cells for 5 types")
    val ev = spark.read.parquet(s"$d/events.parquet")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected,
      "each user must contribute exactly (events-1) transitions")
    rows.groupBy(_.getString(0)).foreach { case (src, cells) =>
      val tot = cells.map(_.getLong(2)).sum
      cells.foreach(r => assert(r.getLong(3) == r.getLong(2) * 1000 / tot, s"p_k drift in $r"))
      val pSum = cells.map(_.getLong(3)).sum
      assert(pSum <= 1000 && pSum > 1000 - cells.length,
        s"$src probabilities sum to $pSum over ${cells.length} cells")
    }
  }

  test("q127: CDC apply equals a local fold of the changelog with tombstone semantics") {
    val rows = AnalyticsQueries.q127(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val log = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP))", "event_type",
        "event_id", "CAST(floor(value * 100) AS LONG)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val expected = log.groupBy(_._1).flatMap { case (uid, evs) =>
      val last = evs.maxBy(e => (e._2, e._4))
      if (last._3 == "error") None
      else Some((uid, last._3, last._5, last._2, evs.length.toLong))
    }.toSet
    assert(rows.toSet == expected, "engine snapshot differs from the local fold")
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // the fixture must actually exercise the tombstone path
    assert(log.groupBy(_._1).values.exists(evs => evs.maxBy(e => (e._2, e._4))._3 == "error"),
      "no user ends on a tombstone — delete semantics untested")
  }

  test("q128: MAD outlier counts match a local robust-stats recomputation") {
    val rows = AnalyticsQueries.q128(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val cents = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("event_type", "CAST(floor(value * 100) AS LONG) AS cents").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def medX2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) * 2
      else s(s.length / 2 - 1) + s(s.length / 2)
    }
    cents.groupBy(_._1).foreach { case (t, vs) =>
      val row = rows.find(_._1 == t).get
      val xs = vs.map(_._2).toSeq
      assert(row._2 == xs.length)
      assert(row._3 == medX2(xs), s"median mismatch for $t")
      // |x - med| = adev_x2/2 with adev_x2 = |2x - med_x2| integral, so
      // mad_x4 = medX2(adev_x2) and the 5*MAD flag is 2*adev_x2 > 5*mad_x4
      val adevX2 = xs.map(x => math.abs(2 * x - medX2(xs)))
      val madX4 = medX2(adevX2)
      assert(row._4 == madX4, s"MAD mismatch for $t")
      val nOut = adevX2.count(a => 2 * a > 5 * madX4)
      assert(row._5 == nOut, s"outlier count mismatch for $t: ${row._5} vs $nOut")
    }
  }

  test("q97: funnel steps are monotonically non-increasing") {
    val rows = AnalyticsQueries.q97(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val counts = rows.map(_.getLong(1))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2), counts.toSeq)
    assert(counts(0) > 0, "no users entered the funnel at all")
  }

  test("q97: single-pass funnel sweep equals the join-chain reference") {
    val fast = AnalyticsQueries.q97(spark, d).collect().map(_.toSeq).toSeq
    val ref = AnalyticsQueries.q97JoinForm(spark, d).collect().map(_.toSeq).toSeq
    assert(fast == ref, s"sweep=$fast joins=$ref")
  }

  test("funnel sweep: ties at equal ts never advance a step (strict ordering)") {
    import spark.implicits._
    // user 1: signup and click at the SAME microsecond -> click must not
    // count; user 2: click strictly later -> counts; purchase before
    // click never counts even though it is after signup
    val ev = Seq(
      (1L, "signup", 100L), (1L, "click", 100L),
      (2L, "signup", 100L), (2L, "purchase", 150L), (2L, "click", 200L))
      .toDF("user_id", "event_type", "tus")
    val out = graft.functions.Funnel
      .funnelCounts(ev, "user_id", "event_type", "tus",
        Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 2L), (2L, 1L), (3L, 0L)), out)
  }

  test("q98: retention offsets are non-negative and cohort week-0 counts cover each cohort") {
    val rows = AnalyticsQueries.q98(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 0, s"negative offset in $r"))
    // every cohort has an offset-0 row (its own first week) at least as
    // large as any later offset of the same cohort
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (c, rs) =>
      val zero = rs.find(_.getLong(1) == 0L)
      assert(zero.isDefined, s"cohort $c missing offset 0")
      rs.foreach(r => assert(r.getLong(2) <= zero.get.getLong(2),
        s"cohort $c offset ${r.getLong(1)} exceeds week-0"))
    }
  }

  test("q99: winsorized sums respect the clip bounds") {
    val rows = AnalyticsQueries.q99(spark, d).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("click", "error", "purchase", "signup", "view"))
    rows.foreach { r =>
      val (n, sum, avg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0)
      assert(avg == sum * 100 / n, s"avg mismatch in $r")
    }
  }

  test("q100: the grand-total grouping-set row equals the table size") {
    val rows = AnalyticsQueries.q100(spark, d).collect()
    val total = rows.filter(r => r.getByte(2) == 1 && r.getByte(3) == 1)
    assert(total.length == 1)
    assert(total.head.getLong(4) == 500L)
    // per-lang rows and per-source rows each sum to the same total
    val perLang = rows.filter(r => r.getByte(2) == 0).map(_.getLong(4)).sum
    val perSource = rows.filter(r => r.getByte(3) == 0).map(_.getLong(4)).sum
    assert(perLang == 500L && perSource == 500L)
  }

  test("q101: pivot cells sum to the corpus size and langs partition each source") {
    val rows = AnalyticsQueries.q101(spark, d).collect()
    assert(rows.length == 20)
    val cellSum = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(cellSum == 500L)
  }

  test("q113: grid is contiguous per user and fills carry the last observed value") {
    val rows = AnalyticsQueries.q113(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, rs) =>
      val sorted = rs.sortBy(_._2)
      // contiguous daily grid, first day observed
      assert(sorted.head._4 == 1, s"user $user first grid day must be observed")
      sorted.map(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b == a + 1, s"user $user gap between $a and $b")
        case _           =>
      }
      // forward fill: an unobserved day carries the previous day's value
      sorted.sliding(2).foreach {
        case Array((_, _, prev, _), (_, _, v, obs)) if obs == 0 =>
          assert(v == prev, s"user $user fill must carry the previous value")
        case _ =>
      }
    }
    // at least one genuinely filled row exists in the fixture
    assert(rows.exists(_._4 == 0), "fixture should contain gaps to fill")
  }

  test("q121: SCD2 intervals tile each user's history and compact state runs") {
    val rows = AnalyticsQueries.q121(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    val events = Tables.events(spark, d).count()
    assert(rows.map(_._5).sum == events, "interval event counts must cover every event")
    rows.groupBy(_._1).foreach { case (user, ivs0) =>
      val ivs = ivs0.sortBy(iv => (iv._3, iv._2)).toSeq
      // exactly one open (current) interval per user, and it is the last
      assert(ivs.count(_._4.isEmpty) == 1, s"user $user open intervals")
      assert(ivs.last._4.isEmpty && ivs.last._6 == 1)
      // closed intervals chain: valid_to == next valid_from
      ivs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4.contains(b._3), s"user $user: interval chain broken")
          assert(a._2 != b._2, s"user $user: adjacent intervals share state ${a._2}")
        case _ => ()
      }
    }
  }
}
