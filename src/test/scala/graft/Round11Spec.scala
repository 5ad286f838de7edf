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

  // --- q168/q169 kNN graph ---------------------------------------------------

  /** Exact per-node state for the graph assertions: vectors, cosine-bp,
    * and the brute-force top-5 ground truth for a fixture dir. */
  private def exactTop5(dir: String): (Map[Long, Array[Double]], Map[Long, Set[Long]],
      (Array[Double], Array[Double]) => Long) = {
    val vecs: Map[Long, Array[Double]] = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val cosBp = (a: Array[Double], b: Array[Double]) =>
      math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 10000).toLong
    val ids = vecs.keys.toSeq.sorted
    val exact: Map[Long, Set[Long]] = ids.map { a =>
      a -> ids.filter(_ != a)
        .map(bid => (cosBp(vecs(a), vecs(bid)), bid))
        .sortBy { case (s, bid) => (-s, bid) }.take(5).map(_._2).toSet
    }.toMap
    (vecs, exact, cosBp)
  }

  private lazy val gtState = exactTop5(sf("sf0.001"))

  /** Shared structure + recall gate for both graph queries. */
  private def checkGraph(q: String, recallFloor: Double): Unit = {
    val (vecs, exact, cosBp) = gtState
    val out = SparkEntry.queries(q)(spark, sf("sf0.001"))
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
    val ids = vecs.keys.toSeq.sorted
    val hits = ids.map(a => (byNode(a).map(_.getLong(2)).toSet & exact(a)).size).sum
    val recall = hits.toDouble / (5.0 * ids.size)
    assert(recall >= recallFloor, s"$q recall@5 fell to $recall (floor $recallFloor)")
  }

  test("q168 kNN graph: recall@5 >= 0.52 vs exact brute force, sims exact, degrees bounded") {
    // measured 0.5244 on the fixture — the multi-table-seed + one-NN-
    // descent-round quality, sitting between q162's 0.425 and q163's
    // 0.600 shortlist pins
    checkGraph("q168_knn_graph", 0.52)
  }

  test("q169 converged kNN graph: recall@5 >= 0.97 vs exact brute force") {
    // measured 0.9736 with (K=15, und=30, 3 rounds) — vs 0.5244 for the
    // single round; the K-width was the binding lever (K=10 plateaued at
    // 0.86 regardless of extra rounds/caps), exactly Dong et al.'s
    // K-vs-recall tradeoff
    checkGraph("q169_knn_converged", 0.97)
  }

  test("q169 bench-scale recall pin: recall@5 >= 0.85 at sf0.1") {
    // the sf0.001 floor (0.97) alone lets a cap/width tweak silently
    // regress the BENCH-scale graph (measured 0.8822 at sf0.1 in r12,
    // 0.925-serving off it in r13) — pin the larger fixture too
    val (vecs, exact, _) = exactTop5(sf("sf0.1"))
    val byNode = SparkEntry.queries("q169_knn_converged")(spark, sf("sf0.1"))
      .select("vec_id", "nb_id").collect().groupBy(_.getLong(0))
    val ids = vecs.keys.toSeq.sorted
    val hits = ids.map(a => (byNode(a).map(_.getLong(1)).toSet & exact(a)).size).sum
    val recall = hits.toDouble / (5.0 * ids.size)
    assert(recall >= 0.85, s"q169 recall@5 at sf0.1 fell to $recall (floor 0.85)")
  }

  test("q171 knob frontier at sf0.1: one beam notch down stays in its measured band") {
    // round-16 verdict ask #7: the fixed-param floors (beam=30 → ≥0.9)
    // can mask a silent geometry regression that the wide beam absorbs.
    // Sweep the beam ONE notch down on the same artifact and pin the
    // measured frontier: beam=20 has its own floor, the knob stays
    // monotone, and the gap between the notches stays the narrow band
    // measured when the recipe was frozen (r13: 0.825 @ 20, 0.925 @ 30)
    // — a recipe regression shows up first as a collapsing low notch.
    import graft.queries.Round11Queries
    graft.GraftFunctions.ensure(spark)
    val dir = sf("sf0.1")
    val (vecs, exact, _) = exactTop5(dir)
    val idx = Round11Queries.knnGraphIndex(spark, dir)
    val b = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val q = b.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def recallAt(beam: Int): Double = {
      val (frontier, _) = Round11Queries.graphSearch(
        spark.read.parquet(s"$idx/graph").select(col("src"), col("nb")),
        spark.read.parquet(s"$idx/buckets"), b, q, beam)
      // frontier columns are (q_id, vec_id, sim): rank by (sim desc, id)
      val byQ = frontier.collect().groupBy(_.getLong(0))
      (0L until 8L).map { qi =>
        val top5 = byQ(qi).map(r => (r.getLong(2), r.getLong(1)))
          .sortBy { case (s, id) => (-s, id) }.take(5).map(_._2).toSet
        (top5 & exact(qi)).size
      }.sum / 40.0
    }
    val r30 = recallAt(30)
    val r20 = recallAt(20)
    assert(r30 >= 0.9, s"beam=30 recall@5 fell to $r30 (floor 0.9)")
    assert(r20 >= 0.75, s"beam=20 recall@5 fell to $r20 (measured 0.825; floor 0.75)")
    assert(r20 <= r30, s"beam knob must be monotone: $r20 @ 20 vs $r30 @ 30")
    assert(r30 - r20 <= 0.2,
      s"knob frontier widened: $r30 @ 30 vs $r20 @ 20 — the wide beam is " +
        "absorbing a geometry regression the floors can't see")
  }

  test("q171 graph-descent ANN: recall@5 >= 0.9, structure dense, beats the Hamming path") {
    val (vecs, exact, _) = gtState
    val out = SparkEntry.queries("q171_graph_ann")(spark, sf("sf0.001"))
      .select("q_id", "rn", "vec_id", "sim_q").collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet, "one result list per query")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Number]("rn").intValue()).sorted.toSeq == (1 to 5),
        s"query $q: ranks must be dense 1..5")
      val ids = rows.map(_.getLong(2))
      assert(ids.distinct.length == 5 && !ids.contains(q),
        s"query $q: results must be 5 distinct non-self ids")
      // sims must be the exact cosine bp of the emitted pair
      rows.foreach(r => assert(r.getLong(3) ==
        gtState._3(vecs(q), vecs(r.getLong(2))),
        s"query $q -> ${r.getLong(2)}: sim_q diverges from exact cosine"))
    }
    val hits = (0L until 8L).map(q => (byQ(q).map(_.getLong(2)).toSet & exact(q)).size).sum
    val r171 = hits.toDouble / 40.0
    assert(r171 >= 0.9, s"q171 recall@5 fell to $r171 (floor 0.9; measured 1.0)")
    // the round-12 verdict's bar: the graph-served path must beat q163's
    // 32-deep Hamming shortlist on the SAME queries (measured 1.0 vs 0.6
    // at sf0.001, 0.925 vs 0.375 at sf0.1)
    val ham = SparkEntry.queries("q163_hamming_ann")(spark, sf("sf0.001"))
      .select("q_id", "vec_id").collect().groupBy(_.getLong(0))
    val hHits = (0L until 8L).map(q => (ham(q).map(_.getLong(1)).toSet & exact(q)).size).sum
    assert(r171 > hHits / 40.0,
      s"graph-descent recall $r171 must beat Hamming ${hHits / 40.0}")
  }

  test("q173 hierarchical ANN: recall@5 >= 0.9, structure dense, layers sound") {
    val (vecs, exact, cosBp) = gtState
    val out = SparkEntry.queries("q173_hnsw_ann")(spark, sf("sf0.001"))
      .select("q_id", "rn", "vec_id", "sim_q").collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet, "one result list per query")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Number]("rn").intValue()).sorted.toSeq == (1 to 5),
        s"query $q: ranks must be dense 1..5")
      val ids = rows.map(_.getLong(2))
      assert(ids.distinct.length == 5 && !ids.contains(q),
        s"query $q: results must be 5 distinct non-self ids")
      rows.foreach(r => assert(r.getLong(3) == cosBp(vecs(q), vecs(r.getLong(2))),
        s"query $q -> ${r.getLong(2)}: sim_q diverges from exact cosine"))
    }
    val hits = (0L until 8L).map(q => (byQ(q).map(_.getLong(2)).toSet & exact(q)).size).sum
    val r173 = hits.toDouble / 40.0
    assert(r173 >= 0.9, s"q173 recall@5 fell to $r173 (floor 0.9)")
    // the layer artifact: every graph node really is a member of its
    // level (the md5 level draw), and the broad first layer is well
    // covered — a hash/modulus drift on either side would break the
    // oracle replay before it broke recall
    val idxH = graft.queries.Round11Queries.hnswIndex(spark, sf("sf0.001"))
    val layers = spark.read.parquet(s"$idxH/layers")
      .select("lvl", "src").distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    def lvlOk(l: Int, id: Long): Boolean = {
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
      h % Seq.fill(l)(4L).product == 0
    }
    layers.foreach { case (l, id) =>
      assert(lvlOk(l, id), s"node $id sits on layer $l but fails the level hash")
    }
    val l1 = layers.filter(_._1 == 1).map(_._2).toSet
    val l1Expected = vecs.keySet.filter(lvlOk(1, _))
    assert(l1.size >= l1Expected.size / 2,
      s"layer 1 covers ${l1.size} of ${l1Expected.size} promoted nodes")
  }

  test("q174 filtered graph ANN: label-pure, sims exact, recall vs filtered brute force pinned") {
    val (vecs, _, cosBp) = gtState
    val labels: Map[Long, Int] = Tables.embeddings(spark, sf("sf0.001"))
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // exact label-filtered ground truth: top-5 among label-3 non-self ids
    val pool = labels.filter(_._2 == 3).keys.toSeq.sorted
    val gt: Map[Long, Set[Long]] = (0L until 8L).map { q =>
      q -> pool.filter(_ != q)
        .map(c => (cosBp(vecs(q), vecs(c)), c))
        .sortBy { case (s, c) => (-s, c) }.take(5).map(_._2).toSet
    }.toMap
    val out = SparkEntry.queries("q174_filtered_graph_ann")(spark, sf("sf0.001"))
      .select("q_id", "rn", "vec_id", "sim_q").collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet, "one result list per query")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Number]("rn").intValue()).sorted.toSeq ==
        (1 to rows.length).toSeq, s"query $q: ranks must be dense")
      val ids = rows.map(_.getLong(2))
      assert(ids.distinct.length == ids.length && !ids.contains(q),
        s"query $q: results must be distinct non-self ids")
      // every result satisfies the predicate — the filtered contract
      ids.foreach(id => assert(labels(id) == 3,
        s"query $q: result $id has label ${labels(id)}, filter is label=3"))
      rows.foreach(r => assert(r.getLong(3) == cosBp(vecs(q), vecs(r.getLong(2))),
        s"query $q -> ${r.getLong(2)}: sim_q diverges from exact cosine"))
    }
    val hits = (0L until 8L).map(q => (byQ(q).map(_.getLong(2)).toSet & gt(q)).size).sum
    val r174 = hits.toDouble / 40.0
    info(s"q174 filtered recall@5 = $r174")
    assert(r174 >= 0.9, s"q174 filtered recall@5 fell to $r174 (floor 0.9; measured 0.975)")
  }

  test("q176 PQ-fused traversal: recall pinned, sims exact after rerank, hops never read the float payload") {
    val (vecs, exact, cosBp) = gtState
    val out = SparkEntry.queries("q176_pq_graph_ann")(spark, sf("sf0.001"))
    val rows = out.select("q_id", "rn", "vec_id", "sim_q").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet, "one result list per query")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Number]("rn").intValue()).sorted.toSeq == (1 to 5),
        s"query $q: ranks must be dense 1..5")
      val ids = rs.map(_.getLong(2))
      assert(ids.distinct.length == 5 && !ids.contains(q),
        s"query $q: results must be 5 distinct non-self ids")
      // the rerank restores FULL precision: emitted sims are exact
      rs.foreach(r => assert(r.getLong(3) == cosBp(vecs(q), vecs(r.getLong(2))),
        s"query $q -> ${r.getLong(2)}: sim_q diverges from exact cosine"))
    }
    val hits = (0L until 8L).map(q => (byQ(q).map(_.getLong(2)).toSet & exact(q)).size).sum
    val r176 = hits.toDouble / 40.0
    info(s"q176 PQ-traversal recall@5 = $r176 (q171 exact-scored: 1.0)")
    // measured knob frontier on the fixture: 0.425 @ (L=30, rerank 10),
    // 0.75 @ (60, 30), 0.875 @ (90, 60) — recall follows the rerank
    // budget exactly as DiskANN's L does; shipped knobs are (90, 60)
    assert(r176 >= 0.8, s"q176 recall@5 fell to $r176 (floor 0.8; measured 0.875)")
    // the DiskANN split in the plan: every scan that reads the PQ codes
    // is pruned away from the float payload (8 code bytes, not 256).
    // The per-hop localCheckpoints truncate the hop sub-plans out of
    // q176's final plan, so pin the guard on the traversal's own
    // ADC-scored entry plan (pqSearch._2) — the hops score through the
    // same scoreAdc over the same index read by construction.
    val (_, entryProbe, hop1) =
      graft.queries.Round11Queries.pqSearch(spark, sf("sf0.001"))
    // pin the rcodes-only pruned scan on BOTH guard hooks: the entry
    // probe AND a real in-loop hop expansion (round-16 ADVICE — the
    // entry plan alone relied on the hops sharing scoreAdc by
    // construction; this catches a future edit that widens the hop read)
    for ((df, which) <- Seq((entryProbe, "entry"), (hop1, "hop1"))) {
      val plan = df.queryExecution.executedPlan.toString
      val codeScans = plan.linesIterator.filter(l =>
        l.contains("FileScan parquet") && l.contains("rcodes")).toSeq
      assert(codeScans.nonEmpty,
        s"$which must score from the rcodes index scan:\n$plan")
      codeScans.foreach(l => assert(!l.contains("embedding") && !l.contains("prefix"),
        s"$which ADC scan must not read the float payload:\n$l"))
    }
  }

  test("q175 MMR rerank: rank-1 kept, strictly more diverse than plain top-5, subset of the beam") {
    val (vecs, _, cosBp) = gtState
    val plain = SparkEntry.queries("q171_graph_ann")(spark, sf("sf0.001"))
      .select("q_id", "rn", "vec_id").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getAs[Number]("rn").intValue()).map(_.getLong(2)).toSeq).toMap
    val mmr = SparkEntry.queries("q175_mmr_rerank")(spark, sf("sf0.001"))
      .select("q_id", "rn", "vec_id", "sim_q").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getAs[Number]("rn").intValue())
        .map(r => (r.getLong(2), r.getLong(3))).toSeq).toMap
    assert(mmr.keySet == (0L until 8L).toSet, "one MMR list per query")
    def avgPairSim(ids: Seq[Long]): Double =
      (for (Seq(a, c) <- ids.combinations(2)) yield cosBp(vecs(a), vecs(c)).toDouble)
        .toSeq.sum / (ids.size * (ids.size - 1) / 2)
    var sumPlain = 0.0; var sumMmr = 0.0
    for (q <- 0L until 8L) {
      val m = mmr(q)
      assert(m.size == 5 && m.map(_._1).distinct.size == 5,
        s"query $q: MMR must emit 5 distinct results")
      // greedy step 1 is relevance-only: identical to the plain rank-1
      assert(m.head._1 == plain(q).head,
        s"query $q: MMR rank-1 must equal the beam's rank-1")
      // sims are the exact q-candidate cosine (the relevance term)
      m.foreach { case (id, sim) => assert(sim == cosBp(vecs(q), vecs(id)),
        s"query $q -> $id: sim_q diverges from exact cosine") }
      sumPlain += avgPairSim(plain(q)); sumMmr += avgPairSim(m.map(_._1))
    }
    // the point of the operator: the diversified set's average pairwise
    // sim must sit measurably below the plain top-5's (this corpus has
    // exact-clone neighborhoods, so plain top-5 is near-degenerate)
    info(s"avg pairwise sim: plain ${sumPlain / 8}, mmr ${sumMmr / 8}")
    assert(sumMmr < sumPlain - 8 * 100,
      s"MMR must reduce avg pairwise sim by >100 bp/query: plain ${sumPlain / 8} vs mmr ${sumMmr / 8}")
  }

  test("mutualEdges: duplicate directed edges never fake mutuality") {
    import spark.implicits._
    // (1,2) genuinely mutual (appears duplicated in one direction);
    // (3,4) one-directional but fed TWICE — under the old count==2 rule
    // two copies of the same direction counted as mutual (round-16
    // ADVICE); the direction-flag form must reject it
    val g = Seq((1L, 2L, 100L), (1L, 2L, 100L), (2L, 1L, 100L),
      (3L, 4L, 50L), (3L, 4L, 50L), (5L, 5L, 99L)).toDF("src", "nb", "sim")
    val m = graft.queries.Round11Queries.mutualEdges(g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(m == Set((1L, 2L, 100L)),
      s"expected only the genuinely mutual (1,2); got $m")
  }

  test("q170 semantic clusters: survivors are the representatives, splits never straddle a cluster") {
    val out = SparkEntry.queries("q170_semantic_clusters")(spark, sf("sf0.001"))
      .select("vec_id", "cluster_id", "kept", "split").collect()
    assert(out.length == 500, "every corpus vector must get a cluster row")
    // exactly one survivor per cluster — the min-id representative
    out.groupBy(_.getLong(1)).foreach { case (cid, rows) =>
      val kept = rows.filter(_.getInt(2) == 1).map(_.getLong(0))
      assert(kept.toSeq == Seq(cid),
        s"cluster $cid: survivor must be exactly the representative, got ${kept.toSeq}")
      assert(rows.map(_.getLong(0)).min == cid,
        s"cluster $cid: representative must be the min member id")
      // the q130 leakage rule: one cluster, one split
      assert(rows.map(_.getString(3)).distinct.length == 1,
        s"cluster $cid straddles a split boundary")
    }
    // the fixed-fraction cut must actually prune something AND keep the
    // majority — a degenerate all-singletons or one-giant-component
    // outcome means a sparsifier broke (both observed during bring-up)
    val survivors = out.count(_.getInt(2) == 1)
    assert(survivors < 500 && survivors > 250,
      s"expected moderate pruning on the fixture, kept $survivors/500")
  }

  test("ANN index compaction: read tasks collapse per the q136 plan, probe output byte-identical") {
    import graft.queries.Round10Queries
    graft.GraftFunctions.ensure(spark)
    val e = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val vecs = e.select(col("vec_id"), col("v"))
    val cents = graft.queries.LlmQueries.ivfCentroids(vecs)
    val cb = graft.queries.LlmQueries.pqCodebook(vecs)
    val idx = s"${tmp("graft_annidx_compact")}/idx"
    // initial build fragmented on purpose + four ingest drops = a long
    // small-file tail, the shape an ingest loop leaves behind
    Round10Queries.annIndexRows(e.filter(col("vec_id") < 300), cents, cb)
      .repartition(6).write.parquet(idx)
    Seq((300L, 350L), (350L, 400L), (400L, 450L), (450L, 500L)).foreach {
      case (lo, hi) => Round10Queries.appendToAnnIndex(
        e.filter(col("vec_id") >= lo && col("vec_id") < hi), idx, cents, cb)
    }
    val filesBefore = spark.read.parquet(idx).inputFiles.length
    assert(filesBefore >= 10, s"fixture should start fragmented, got $filesBefore files")
    val rowsBefore = spark.read.parquet(idx).collect().map(_.toSeq).toSet
    val qs = e.filter(col("vec_id").isin(5L, 320L, 470L))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def probe(): Seq[Seq[Any]] =
      graft.streaming.Streaming.annProbe(spark.read.parquet(idx), vecs, qs,
          shortlist = 32, k = 5, excludeSelf = false)
        .collect().map(_.toSeq).toSeq
        .sortBy(r => (r.head.toString.toLong, r(1).toString.toInt))
    val probeBefore = probe()
    // target sized so the whole small tail folds into ONE bin — the
    // planner must report it and the manifest must shrink accordingly
    val nBins = Round10Queries.compactAnnIndex(spark, idx, targetBytes = 64L << 20)
    assert(nBins == 1, s"expected the whole small tail in one bin, planned $nBins")
    val filesAfter = spark.read.parquet(idx).inputFiles.length
    assert(filesAfter == 1, s"read tasks must collapse to the bin count, got $filesAfter")
    assert(spark.read.parquet(idx).collect().map(_.toSeq).toSet == rowsBefore,
      "compaction must not change the index row set")
    assert(probe() == probeBefore, "compaction must not change any probe result")
    // idempotence: a second pass finds nothing to do
    assert(Round10Queries.compactAnnIndex(spark, idx, 64L << 20) == 0)
  }

  test("knnGraphBuild minUpdateFrac: early termination stops the descent once updates dry up") {
    graft.GraftFunctions.ensure(spark)
    val b = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // at a 10% update threshold on this fixture the loop must run PAST
    // round 1 (the first descent still rewrites well over a tenth of the
    // edges) but stop before burning all 10 requested rounds — and the
    // early-stopped graph must still beat the single-round recall by a
    // wide margin
    val (g, executed) = graft.queries.Round11Queries.knnGraphBuildCounted(
      b, kInt = 15, undCap = 30, rounds = 10, minUpdateFrac = 0.1)
    assert(executed > 1 && executed < 10,
      s"expected early termination strictly between rounds 1 and 10, ran $executed")
    val (vecs, exact, _) = gtState
    val byNode = g.filter(col("rn") <= 5).select("src", "nb").collect()
      .groupBy(_.getLong(0))
    val ids = vecs.keys.toSeq.sorted
    val hits = ids.map(a => (byNode(a).map(_.getLong(1)).toSet & exact(a)).size).sum
    val recall = hits.toDouble / (5.0 * ids.size)
    assert(recall >= 0.8, s"early-stopped graph recall@5 $recall below 0.8")
  }
}
