package graft

import java.security.MessageDigest

import graft.queries.{AnalyticsQueries, GovernanceQueries, LlmQueries, MultimodalQueries, PipelineQueries, TextQueries}

/** Semantic invariants for the round-6 wave: per-language quantile gate
  * (q129), leakage-safe cluster split (q130), linear multi-touch
  * attribution (q131), in-engine ANN recall eval (q132), and
  * content-defined chunking (q133). Each is checked against an
  * independent local recomputation from the raw fixture parquet.
  */
class Round6Spec extends SparkSpec {

  private def d = sf("sf0.001")

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q129: per-language cut is the exact 20th-percentile lower bound and keeps >= 80%") {
    val rows = TextQueries.q129(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == docs.length, "gate must annotate every document")
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val vals = ds.map(_._3).sorted
      val total = vals.length
      // smallest v with cum*5 >= total over the value histogram
      val cut = vals.distinct.find(v => vals.count(_ <= v) * 5 >= total).get
      val langRows = rows.filter(_._2 == lang)
      assert(langRows.forall(_._4 == cut), s"$lang cut mismatch")
      langRows.foreach { case (_, _, nc, c, kept) =>
        assert(kept == (if (nc >= c) 1 else 0))
      }
      val keptN = langRows.count(_._5 == 1)
      assert(keptN * 5 >= total * 4, s"$lang keeps ${keptN}/$total < 80%")
    }
  }

  test("q130: near-dup docs always share a split; singletons keep q79's own-id hash") {
    val split = LlmQueries.q130(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getString(3)))).toMap
    val pairs = LlmQueries.neardupPairs(spark, d)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a)._2 == split(b)._2, s"near-dups $a,$b split apart: leakage")
    }
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    split.filterNot { case (id, _) => clustered(id) }.foreach { case (id, (rep, sp)) =>
      assert(rep == id, s"singleton $id must represent itself")
      val bucket = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 4), 16) % 10000
      val expected = if (bucket < 8000) "train" else if (bucket < 9000) "val" else "test"
      assert(sp == expected, s"singleton $id split drifted from the q79 hash")
    }
  }

  test("q131: linear attribution equals a local recomputation, credit <= 1000 per purchase") {
    val rows = AnalyticsQueries.q131(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("user_id", "event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS tus", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val week = 604800000000L
    val byUser = ev.groupBy(_._1)
    val expected = byUser.flatMap { case (u, es) =>
      val purchases = es.filter(_._4 == "purchase")
      if (purchases.isEmpty) None else {
        val clicks = es.filter(_._4 == "click").map(_._3)
        var attributed = 0L; var credit = 0L
        purchases.foreach { p =>
          val n = clicks.count(c => c <= p._3 && c > p._3 - week)
          if (n > 0) { attributed += 1; credit += (1000L / n) * n }
        }
        Some(u -> ((purchases.length.toLong, attributed, credit)))
      }
    }
    assert(rows == expected, "attribution table differs from local recomputation")
    rows.values.foreach { case (np, na, cr) =>
      assert(na <= np && cr <= np * 1000, "credit must not exceed 1000 per purchase")
    }
  }

  test("q132: recall table equals a local brute-force GT vs LSH-bucket recomputation") {
    val rows = LlmQueries.q132(spark, d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val em = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cosBp(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000).toLong
    }
    def bucket(v: Array[Double]): Int =
      graft.functions.VectorOps.planes.zipWithIndex.map { case (p, h) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * p(i); i += 1 }
        if (s >= 0) 1 << h else 0
      }.sum
    val buckets = em.map { case (id, v) => id -> bucket(v) }.toMap
    val qs = em.filter(_._1 < 10)
    val expected = qs.map { case (qid, qv) =>
      def top5(cand: Array[(Long, Array[Double])]): Set[Long] =
        cand.map { case (id, v) => (id, cosBp(qv, v)) }
          .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      val gt = top5(em.filter(_._1 != qid))
      val ann = top5(em.filter { case (id, _) => id != qid && buckets(id) == buckets(qid) })
      val hits = (gt & ann).size.toLong
      qid -> ((gt.size.toLong, ann.size.toLong, hits, hits * 100 / gt.size))
    }.toMap
    assert(rows == expected, "recall table differs from local recomputation")
  }

  test("q133: chunks partition each document exactly at the 2-gram hash boundaries") {
    val rows = PipelineQueries.q133(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val ws = text.split(" ")
      val cuts = (2 to ws.length).filter { i =>
        java.lang.Long.parseLong(
          md5hex(ws(i - 2) + " " + ws(i - 1)).substring(0, 15), 16) % 8 == 0
      }
      val starts = 1 +: cuts
      starts.zipWithIndex.map { case (st, j) =>
        val end = if (j + 1 < starts.length) starts(j + 1) else ws.length + 1
        val chunk = ws.slice(st - 1, end - 1)
        (id, (j + 1).toLong, chunk.length.toLong, md5hex(chunk.mkString(" ")))
      }
    }
    assert(rows.sorted.toSeq == expected.sorted.toSeq,
      "chunk table differs from local recomputation")
  }

  test("q136: compaction bins are contiguous, file-preserving, and match the prefix-sum rule") {
    val rows = PipelineQueries.q136(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val files = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("source", "doc_id DIV 32 AS file_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case ((s0, f), ds) => (s0, f, ds.map(_._3).sum) }
    files.groupBy(_._1).foreach { case (src, fs) =>
      val ordered = fs.toSeq.sortBy(_._2)
      var cum = 0L
      val expected = ordered.map { case (_, fid, bytes) =>
        val binId = cum / 4096; cum += bytes; (fid, binId, bytes)
      }
      val binRows = rows.filter(_._1 == src).sortBy(_._2)
      expected.groupBy(_._2).foreach { case (bin, bfs) =>
        val row = binRows.find(_._2 == bin).get
        assert(row._3 == bfs.length && row._4 == bfs.map(_._3).sum, s"$src bin $bin")
        assert(row._5 == bfs.map(_._1).min && row._6 == bfs.map(_._1).max)
      }
      // contiguity: bin k+1 starts after bin k ends — files never split or reorder
      binRows.toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(1)._5 > pair(0)._6, s"$src bins overlap or reorder")
      }
    }
  }

  test("q137: chunk-level near-dup pairs equal a local set-Jaccard recomputation") {
    val rows = MultimodalQueries.q137(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def chunkSet(bytes: String): Set[String] = {
      val cuts = (5 to bytes.length).filter { i =>
        java.lang.Long.parseLong(
          md5hex(bytes.substring(i - 5, i - 1)).substring(0, 15), 16) % 32 == 0
      }
      val starts = 1 +: cuts
      starts.zipWithIndex.map { case (st, j) =>
        val end = if (j + 1 < starts.length) starts(j + 1) else bytes.length + 1
        md5hex(bytes.substring(st - 1, end - 1))
      }.toSet
    }
    val sets = docs.map { case (id, t) => id -> chunkSet(t) }.toMap
    val df = sets.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      ai <- ids.indices; bi <- ai + 1 until ids.length
      a = ids(ai); b = ids(bi)
      common = (sets(a) & sets(b)).count(df(_) <= 64)
      if common > 0
      union = sets(a).size + sets(b).size - common
      if common * 2 >= union
    } yield (a, b) -> common * 10000L / union).toMap
    assert(rows == expected, "chunk near-dup pairs differ from local recomputation")
    assert(rows.nonEmpty, "fixture near-dups should share chunks")
  }

  test("q138: top converting paths equal a local sessionize-cap-count recomputation") {
    val rows = AnalyticsQueries.q138(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ev = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("user_id", "event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS tus", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = 7200000000L
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer[List[(Long, Long, String)]]()
      ordered.foreach { e =>
        if (sessions.isEmpty || e._3 - sessions.last.last._1 > gap)
          sessions += List((e._3, e._2, e._4))
        else sessions.update(sessions.length - 1, sessions.last :+ ((e._3, e._2, e._4)))
      }
      sessions.map(_.take(8)).filter(_.exists(_._3 == "purchase"))
        .map(_.map(_._3).mkString(">"))
    }
    val expected = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(10)
    assert(rows.toSeq == expected, s"paths differ:\n$rows\nvs\n$expected")
  }

  test("q139: confusion marginals and F1 reconcile with q123's verified predictions") {
    val pred = TextQueries.q123(spark, d).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val rows = TextQueries.q139(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val classes = pred.map(_._1).distinct
    classes.foreach { c =>
      val nTrue = pred.count(_._1 == c).toLong
      val nPred = pred.count(_._2 == c).toLong
      val tp = pred.count(p => p._1 == c && p._3 == 1).toLong
      val f1 = tp * 20000 / (nTrue + nPred)
      assert(rows(c) == ((nTrue, nPred, tp, f1)), s"class $c mismatch")
    }
    assert(rows.keySet == classes.toSet)
  }

  test("q140: containment join equals brute force over all ordered pairs (lossless)") {
    val rows = graft.queries.SimilarityQueries.q140(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def shingleSet(t: String): Set[String] = {
      val ws = t.split(" ")
      (if (ws.length < 3) Seq.empty
       else (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" "))).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.filter(_._2.nonEmpty)
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a != b && sb.size * 10 >= sa.size * 9
      inter = (sa & sb).size
      if inter * 10 >= sa.size * 9
    } yield (a, b) -> inter * 10000L / sa.size).toMap
    assert(rows == expected, "prefix-filtered containment must equal brute force")
    assert(rows.nonEmpty, "fixture should contain near-superset pairs")
  }

  test("q141: merged daily partials never drift from the direct aggregate") {
    val out = graft.queries.AggQueries.q141(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(out.nonEmpty && out.forall(_._7 == 0), s"drift detected: $out")
    val ev = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("event_type", "CAST(floor(value * 100) AS LONG) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (t, vs) =>
      val row = out.find(_._1 == t).get
      val cs = vs.map(_._2)
      assert(row._2 == cs.length && row._3 == cs.sum &&
        row._4 == cs.min && row._5 == cs.max && row._6 == cs.sum / cs.length,
        s"$t merged stats differ from raw recomputation")
    }
  }

  test("q142: chi-square 2x2 verdicts equal an exact local recomputation") {
    val rows = AnalyticsQueries.q142(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getInt(6)))).toMap
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val users = ev.map(_._1).distinct
    val (armA, armB) = users.partition(_ % 2 == 0)
    ev.map(_._2).distinct.foreach { t =>
      val convA = armA.count(u => ev.contains((u, t))).toLong
      val convB = armB.count(u => ev.contains((u, t))).toLong
      val (na, nb) = (armA.length.toLong, armB.length.toLong)
      val adbc = BigInt(convA * (nb - convB) - convB * (na - convA))
      val sig = if (BigInt(na + nb) * adbc * adbc * 1000 >
        BigInt(3841) * na * nb * (convA + convB) * (na + nb - convA - convB)) 1 else 0
      val dir = (convA * nb) compare (convB * na)
      assert(rows(t) == ((convA, na, convB, nb, sig, dir)), s"$t mismatch")
    }
  }

  test("q143: metric correlation matrix equals a local exact-moment recomputation") {
    val rows = AnalyticsQueries.q143(spark, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val daily = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("event_type", "day(CAST(ts AS TIMESTAMP)) AS day",
        "CAST(floor(value * 100) AS LONG) AS cents")
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    for (i <- types.indices; j <- i + 1 until types.length) {
      val (ta, tb) = (types(i), types(j))
      val days = daily.keys.filter(_._1 == ta).map(_._2)
        .toSet & daily.keys.filter(_._1 == tb).map(_._2).toSet
      val xs = days.toSeq.sorted.map(dd => (daily((ta, dd)), daily((tb, dd))))
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._1).sum.toDouble, xs.map(_._2).sum.toDouble)
      val sxy = xs.map(p => p._1 * p._2).sum.toDouble
      val sxx = xs.map(p => p._1 * p._1).sum.toDouble
      val syy = xs.map(p => p._2 * p._2).sum.toDouble
      val corr = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(rows((ta, tb)) == ((xs.length.toLong, math.floor(corr * 1e6).toLong)),
        s"($ta,$tb) correlation mismatch")
    }
    assert(rows.size == types.length * (types.length - 1) / 2)
  }

  test("q144: rolling WAU equals a local trailing-7-day distinct recomputation") {
    val rows = AnalyticsQueries.q144(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ud = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("user_id", "day(CAST(ts AS TIMESTAMP)) AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1)))
    (1 to 31).foreach { wend =>
      val wau = ud.filter { case (_, day) => day <= wend && day > wend - 7 }
        .map(_._1).distinct.length.toLong
      assert(rows.getOrElse(wend.toLong, 0L) == wau, s"day $wend WAU mismatch")
    }
  }

  test("q134: KS statistic equals a local exact two-sample recomputation") {
    val rows = GovernanceQueries.q134(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("event_type", "CAST(floor(value * 100) AS LONG) AS cents",
        "day(CAST(ts AS TIMESTAMP)) <= 15 AS base")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val expected = ev.groupBy(_._1).map { case (t, es) =>
      val a = es.filter(_._3).map(_._2).sorted
      val b = es.filterNot(_._3).map(_._2).sorted
      val vals = (a ++ b).distinct.sorted
      val m = vals.map(v =>
        math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)).max
      t -> ((a.length.toLong, b.length.toLong, m * 10000 / (a.length.toLong * b.length)))
    }
    assert(rows == expected, "KS table differs from local recomputation")
    rows.values.foreach { case (_, _, ks) => assert(ks >= 0 && ks <= 10000) }
  }

  test("q135: payload chunks tile each payload; boundaries are content-local under prefix shift") {
    val rows = MultimodalQueries.q135(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def chunksOf(bytes: String): Seq[(Long, Long, String)] = {
      val cuts = (5 to bytes.length).filter { i =>
        java.lang.Long.parseLong(
          md5hex(bytes.substring(i - 5, i - 1)).substring(0, 15), 16) % 32 == 0
      }
      val starts = 1 +: cuts
      starts.zipWithIndex.map { case (st, j) =>
        val end = if (j + 1 < starts.length) starts(j + 1) else bytes.length + 1
        (st.toLong, (end - st).toLong, md5hex(bytes.substring(st - 1, end - 1)))
      }
    }
    val expected = docs.flatMap { case (id, text) =>
      chunksOf(text).zipWithIndex.map { case ((st, n, dg), j) =>
        (id, (j + 1).toLong, st, n, dg)
      }
    }
    assert(rows.sorted.toSeq == expected.sorted.toSeq,
      "payload chunk manifest differs from local recomputation")
    // the CDC property itself: prepending bytes changes only the chunks
    // up to the first post-prefix boundary — the digest SUFFIX survives
    val sample = docs.maxBy(_._2.length)._2
    val orig = chunksOf(sample).map(_._3)
    val shifted = chunksOf("xq9z7vw3 " + sample).map(_._3)
    val common = orig.reverse.zip(shifted.reverse).takeWhile { case (x, y) => x == y }.length
    assert(common >= orig.length - 3,
      s"prefix insertion must preserve the chunk-digest tail: $common of ${orig.length} survive")
  }
}
