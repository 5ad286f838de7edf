package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextOps
import graft.streaming.Streaming

/** Round-14 additions: the composed CDC ingest loop promoted to the
  * oracle board (q178, the q177 discipline applied to
  * [[graft.streaming.Streaming.ingestLoop]]) and the iterated BPE
  * trainer (q179, the fixed-round tokenizer-training loop whose single
  * merge-round statistic q94 computes).
  */
object Round14Queries extends QueryPack {

  /** Phase timing for the two maintenance gates, printed to stderr when
    * GRAFT_MAINT_PROFILE is set — the gates are the board's densest
    * micro-job chains, and tuning them blind re-litigates the same
    * guesses every round. Zero cost when unset. */
  private[queries] def tlog(msg: => String): Unit =
    if (sys.env.contains("GRAFT_MAINT_PROFILE"))
      Console.err.println(f"[maintprof] ${System.nanoTime() / 1e9}%.3f $msg")

  // q178: the composed CDC ingest under the hash gate --------------------

  /** q178: EXECUTE the composed streaming ingest loop in-engine — two
    * CDC micro-batches of adds and deletes through
    * [[graft.streaming.Streaming.ingestLoop]] against a real band
    * index, annidx3 layout and kNN graph — and emit the lifecycle
    * invariants as verdict literals the oracle states (the q177
    * discipline; a per-row oracle can't replay a stateful streaming
    * loop, but it CAN demand the invariants every correct ingest
    * implementation satisfies):
    *
    *   - `dup_rejected`      — an exact copy of a base document under a
    *                           new id never passes the near-dup gate;
    *   - `novel_accepted`    — a fresh document passes and its vector
    *                           serves from BOTH the ANN index and the
    *                           graph artifact (self-probe top-1 at
    *                           ≥ 9999 bp);
    *   - `readd_accepted`    — a batch-1 takedown frees the gate, so
    *                           batch 2 re-ingests the retired text
    *                           under a new id, and a probe with the
    *                           RETIRED doc's own vector lands on the
    *                           re-licensed copy, never the tombstone;
    *   - `delete_hidden`     — retired ids (a base doc AND a
    *                           previously-appended survivor) are gone
    *                           from the index read, the graph edge set
    *                           and the corpus;
    *   - `purge_physical`    — the in-loop purge+compact after batch 2
    *                           made the deletes physical: sidecar gone,
    *                           the raw parquet read equals the
    *                           delete-aware read, and a fresh purge is
    *                           a no-op.
    *
    * Size is FIXED (200 base docs, 5 CDC rows), independent of sf: the
    * query grades maintenance SEMANTICS, not throughput — the scale
    * curves for each maintained artifact live with their operators
    * (q168–q177, BENCH_SCALING). HNSW layers and the cluster table are
    * left un-maintained here (`None`): their CDC invariants are pinned
    * in StreamingSpec and q177; this keeps the gate's cost at the
    * band-index + annidx3 + graph floor. */
  /** The ONE standing-state build shared by BOTH maintenance gates
    * (q177 cluster maintenance + this query) — round-15 verdict ask #1:
    * on a cold board each gate paid its own corpus join + graph build
    * (`maint177` + `cdc178` scratch dirs), ~22 s of driver-board tax
    * for two queries that grade fixed-size SEMANTICS. Both gates derive
    * a q168-recipe kNN graph and slice-sized serving artifacts from the
    * SAME ≤[[MaintSlice]]-doc base slice, so the corpus is now touched
    * once per fixture and every artifact is written once:
    *
    *   - `base`    — the joined (doc_id, text, label, v) slice;
    *   - `sigs`    — q178's near-dup signature table over the slice;
    *   - `annidx`  — q178's annidx3 template (copied per run; the loop
    *                 mutates its copy);
    *   - `g0`      — q178's serving graph over ALL slice vectors
    *                 (internal width 15/30, the ingest loop's params);
    *   - `probe`   — q178's three quoted fixture rows;
    *   - `gold`/`thr`/`c0` — q177's standing 80% graph (vec_id%5≠4,
    *                 the q168 [[Round11Queries.KgK]]/[[Round11Queries
    *                 .KgUnd]] recipe), frozen threshold and initial
    *                 cluster map.
    *
    * Everything after the first (constraint-pruned) corpus join is
    * slice-sized at every sf, so the build runs at 4 shuffle
    * partitions with codegen and AQE ON (round-15 ADVICE: the gates'
    * interpreted-micro-plan knobs are scoped to the gates alone; the
    * build keeps the execution engine). All artifacts are single-part
    * files: slice-sized frames
    * read as one task, and the per-run annidx copy touches 1 data
    * file. The version token folds the slice bound and both graph
    * recipes into the marker, so changing any of them rebuilds the
    * standing state instead of serving stale scratch (round-15
    * ADVICE). */
  private[queries] val MaintSlice = 200L
  private[queries] def maintScratch(s: SparkSession, d: String): String = {
    graft.GraftFunctions.ensure(s)
    val ver = s"r16:slice=$MaintSlice:g0=15/30x1" +
      s":gold=${Round11Queries.KgK}/${Round11Queries.KgUnd}x1:bands=64"
    // everything after the constraint-pruned corpus join is ≤slice-sized
    // AT EVERY sf (the slice bound is a constant), so the one-time
    // build runs under the same micro-plan knobs as the gates: 4
    // shuffle partitions, AQE off (with AQE each shuffle stage of the
    // ~15 build actions becomes its own job — measured 85 jobs for the
    // build vs ~15 actions), codegen off (every build plan is unique,
    // so each would pay Janino for ≤slice-sized input). This addresses
    // the round-15 ADVICE the right way round: the knobs are scoped to
    // slice-sized work — which the build now IS, at every sf — not to
    // whatever happens to run inside the gate's dynamic scope.
    val saved = Seq("spark.sql.shuffle.partitions",
      "spark.sql.codegen.wholeStage", "spark.sql.adaptive.enabled")
      .map(k => k -> s.conf.get(k))
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try maintScratchBody(s, d, ver)
    finally saved.foreach { case (k, v) => s.conf.set(k, v) }
  }

  private def maintScratchBody(s: SparkSession, d: String, ver: String): String =
    Round8Queries.ensureScratch(s, "maint", d, ver) { baseDir =>
      val toD = (c: Column) => transform(c, _.cast("double"))
      val joined = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .join(Tables.embeddings(s, d)
            .select(col("vec_id"), col("label"), toD(col("embedding")).as("v")),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("text"), col("label"), col("v"))
      tlog("maint build start")
      val base = joined.filter(col("doc_id") < MaintSlice).localCheckpoint(true)
      base.repartition(1).write.parquet(s"$baseDir/base")
      tlog("maint build: base slice written")
      Streaming.buildNearDupIndex(base.select(col("doc_id"), col("text")), 64)
        .sigs.repartition(1).write.parquet(s"$baseDir/sigs")
      tlog("maint build: sigs written")
      val baseVecs = base.select(col("doc_id").as("vec_id"), col("v"))
      Round10Queries.annIndexRows(
          base.select(col("doc_id").as("vec_id"), col("label"), col("v")),
          LlmQueries.ivfCentroids(baseVecs), LlmQueries.pqCodebook(baseVecs))
        .repartition(1).write.parquet(s"$baseDir/annidx")
      tlog("maint build: annidx written")
      Round11Queries.knnGraphBuild(baseVecs, 15, 30, rounds = 1)
        .select(col("src"), col("nb"), col("sim"))
        .repartition(1).write.parquet(s"$baseDir/g0")
      tlog("maint build: g0 written")
      // the three fixture rows the CDC script quotes (two re-licensed
      // texts, three probe vectors) — collected per run as ONE tiny read
      joined.filter(col("doc_id").isin(5L, 7L, 450L))
        .repartition(1).write.parquet(s"$baseDir/probe")
      // q177's standing state: the 80% graph, its frozen merge
      // threshold, and the initial cluster map the appends fold into
      val bOld = baseVecs.filter(col("vec_id") % 5 =!= 4)
      val gold = Round11Queries
        .knnGraphBuild(bOld, Round11Queries.KgK, Round11Queries.KgUnd, rounds = 1)
        .select(col("src"), col("nb"), col("sim")).localCheckpoint(false)
      gold.repartition(1).write.parquet(s"$baseDir/gold")
      tlog("maint build: gold written")
      val thr = Round11Queries.clusterThreshold(gold)
      s.range(1).select(lit(thr).as("thr")).write.parquet(s"$baseDir/thr")
      Round11Queries.clusterMap(bOld.select(col("vec_id")), gold, thr)
        .repartition(1).write.parquet(s"$baseDir/c0")
      tlog("maint build: c0 written")
    }

  def q178(s: SparkSession, d: String): DataFrame = {
    graft.GraftFunctions.ensure(s)
    // The PRE-EXISTING serving artifacts are written once per fixture
    // ([[maintScratch]], shared with q177): they are the state the CDC
    // loop operates ON, laid down by the original build in production —
    // re-deriving them per run re-timed the build recipe (r14 verdict:
    // q177+q178 = 14% of the board). Each run COPIES the annidx
    // template to a private temp dir (the loop mutates it: appends,
    // tombstones, purge) and re-executes the whole ingest + every
    // verdict assertion.
    val scratch = maintScratch(s, d)
    // every frame in the gate is ≤ a few hundred rows, but the loop
    // executes ~40 eager jobs (checkpoints, gates, appends, probes) —
    // at the session's 32 shuffle partitions that is 32 tasks per tiny
    // exchange; 1 partition cuts the fixed floor with identical results
    // (verdict literals). Whole-stage codegen and AQE are likewise a
    // net LOSS at this job size — each of the ~40 unique micro-plans
    // pays a Janino compile / a runtime re-plan to process a few
    // hundred rows — so both are off for the gate's scope (and ONLY
    // the gate's: the standing build above runs under its own knobs,
    // round-15 ADVICE). All four knobs saved and restored; the fourth
    // routes the stream's checkpoint log to the same ephemeral root.
    val saved = Seq("spark.sql.shuffle.partitions",
      "spark.sql.codegen.wholeStage", "spark.sql.adaptive.enabled")
      .map(k => k -> s.conf.get(k))
    val savedCkpt = s.conf.getOption("spark.sql.streaming.checkpointLocation")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // the per-run mutable state is EPHEMERAL BY DESIGN (deleted in the
    // finally): a RAM-backed tmpfs is the right medium for it — the
    // loop's appends, tombstone sidecars, purge rewrites and the
    // micro-batch commit log are dozens of tiny files whose fsync/
    // rename cost is pure overhead on a disk-backed /tmp. Durability
    // of the REAL artifact is the template's concern (ensureScratch on
    // java.io.tmpdir), not this copy's.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val tmpRoot =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
        java.nio.file.Files.createTempDirectory(shm, "graft_q178")
      else java.nio.file.Files.createTempDirectory("graft_q178")
    val idxPath = tmpRoot.toString + "/annidx"
    s.conf.set("spark.sql.streaming.checkpointLocation", tmpRoot.toString + "/ckpt")
    try q178Gate(s, scratch, idxPath)
    finally { // the verdict frame is pure literals — the files can go
      saved.foreach { case (k, v) => s.conf.set(k, v) }
      savedCkpt match {
        case Some(v) => s.conf.set("spark.sql.streaming.checkpointLocation", v)
        case None => s.conf.unset("spark.sql.streaming.checkpointLocation")
      }
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpRoot).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  private def q178Gate(s: SparkSession, scratch: String,
                       idxPath: String): DataFrame = {
    import s.implicits._
    tlog("q178 gate start")
    // private mutable copy of the annidx template (file-level copy, no
    // Spark job — the loop appends part files, writes tombstone
    // sidecars and physically rewrites it at purge/compact)
    locally {
      import scala.jdk.CollectionConverters._
      val src = java.nio.file.Paths.get(scratch, "annidx")
      val dst = java.nio.file.Paths.get(idxPath)
      java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
        java.nio.file.Files.copy(p, dst.resolve(src.relativize(p).toString),
          java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
      }
    }
    tlog("template copied")
    val base = s.read.parquet(s"$scratch/base")
    val baseVecs = base.select(col("doc_id").as("vec_id"), col("v"))
    val cents = LlmQueries.ivfCentroids(baseVecs)
    val cb = LlmQueries.pqCodebook(baseVecs)
    tlog("model artifacts collected")
    val g0 = s.read.parquet(s"$scratch/g0").select(col("src"), col("nb"), col("sim"))
    val st = new Streaming.IngestState(
      Streaming.indexFromSigs(s.read.parquet(s"$scratch/sigs"), 64),
      idxPath, g0, baseVecs.localCheckpoint(true), cents, cb)
    val probe = s.read.parquet(s"$scratch/probe")
      .select(col("doc_id"), col("text"), col("v")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[Double](2)))).toMap
    def textOf(id: Long) = probe(id)._1
    def vecOf(id: Long) = probe(id)._2
    // the novel doc: vocabulary-disjoint text (cannot near-dup any
    // fixture doc) carrying a REAL fixture vector outside the base slice
    val novel = "relicense takedown exemplar verdict ingest lifecycle " +
      "tombstone sidecar supersede compaction physical purge graft"
    val d1 = Seq(
      Streaming.IngestDoc(5, "", 0, Seq.empty, op = "del"),      // takedown
      Streaming.IngestDoc(450, novel, 2, vecOf(450)),            // novel add
      Streaming.IngestDoc(901, textOf(7), 1, vecOf(7)))          // exact dup
    val d2 = Seq(
      Streaming.IngestDoc(902, textOf(5), 1, vecOf(5)),          // re-license
      Streaming.IngestDoc(450, "", 0, Seq.empty, op = "del"))    // retire a survivor
    implicit val sqlc: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Streaming.IngestDoc]
    val verdicts = scala.collection.mutable.Map[Long, Map[Long, Int]]()
    val q = Streaming.ingestLoop(mem.toDF(), st, bandCap = 64, kInt = 15,
      undCap = 30, compactEvery = 2, compactTarget = 64L << 20,
      (id, v) => verdicts.synchronized {
        verdicts(id) = v.select("doc_id", "kept").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
      })
    tlog("state initialized")
    mem.addData(d1: _*); q.processAllAvailable()
    tlog("batch 1 done")
    mem.addData(d2: _*); q.processAllAvailable()
    tlog("batch 2 done")
    q.stop()
    tlog("stream stopped")
    val dupRejected = verdicts(0L).get(901L).contains(0) &&
      verdicts(0L).get(450L).contains(1)
    val readdAccepted = verdicts(1L).get(902L).contains(1)
    // survivor set: base minus the takedown, plus the re-license (450
    // was appended in batch 1 and retired in batch 2)
    val surviving = (0L until 200L).toSet - 5L + 902L
    val idxRead = Round10Queries.readAnnIndex(s, idxPath)
    // one tagged union + one collect instead of FIVE separate jobs —
    // the assertions read four artifacts (delete-aware index read, raw
    // index parquet, corpus, graph edge endpoints) but need only their
    // id sets, so all four ship through a single distinct
    val tagged = idxRead.select(lit("i").as("t"), col("vec_id"))
      .unionByName(s.read.parquet(idxPath).select(lit("r").as("t"), col("vec_id")))
      .unionByName(st.corpus.select(lit("c").as("t"), col("vec_id")))
      .unionByName(st.graph.select(lit("g").as("t"), col("src").as("vec_id")))
      .unionByName(st.graph.select(lit("g").as("t"), col("nb").as("vec_id")))
      .distinct().collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val deleteHidden = tagged.getOrElse("i", Set.empty) == surviving &&
      tagged.getOrElse("c", Set.empty) == surviving &&
      (tagged.getOrElse("g", Set.empty[Long]) & Set(5L, 450L)).isEmpty
    tlog("tagged-union assertion done")
    // serving sees the CDC stream's outcome through BOTH retrievers: a
    // probe with the RETIRED doc's own vector answers its re-added
    // copy. Both retrievers' top-1 ride ONE union job — their subplans
    // share the corpus/graph checkpoints, and per-action planning is
    // the gate's dominant cost (measured: fusing halves this phase).
    val probeQ = Seq((8005L, vecOf(5))).toDF("q_id", "qv")
    val annTop1 = Streaming.annProbe(idxRead,
        st.corpus.select(col("vec_id"), col("v")), probeQ,
        shortlist = 32, k = 1, excludeSelf = false)
      .select(lit("a").as("t"), col("vec_id"), col("sim_q").as("sim"))
    val (gSrv, _) = Round11Queries.graphSearch(
      st.graph.select(col("src"), col("nb")),
      Round11Queries.cappedBuckets(Round11Queries.bucketMembership(st.corpus)),
      st.corpus.select(col("vec_id"), col("v")), probeQ)
    val gTop1 = gSrv.orderBy(col("sim").desc, col("vec_id"))
      .select(lit("g").as("t"), col("vec_id"), col("sim")).limit(1)
    val top1 = annTop1.unionByName(gTop1).collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.head }
    def top1Is902(r: Option[org.apache.spark.sql.Row]) =
      r.exists(x => x.getLong(1) == 902L && x.getLong(2) >= 9999L)
    val served = top1Is902(top1.get("a")) && top1Is902(top1.get("g"))
    tlog("serving probes done")
    // the in-loop purge+compact after batch 2 made the deletes physical
    // (the raw read rode the tagged union above as tag "r")
    val purged = !new java.io.File(idxPath + ".tombstones").exists() &&
      tagged.getOrElse("r", Set.empty) == surviving &&
      Round10Queries.purgeAnnIndex(s, idxPath) == 0
    tlog("purge assertion done")
    s.range(1).select(
      lit(if (dupRejected) 1 else 0).cast("int").as("dup_rejected"),
      lit(if (readdAccepted) 1 else 0).cast("int").as("readd_accepted"),
      lit(if (deleteHidden) 1 else 0).cast("int").as("delete_hidden"),
      lit(if (served) 1 else 0).cast("int").as("survivor_served"),
      lit(if (purged) 1 else 0).cast("int").as("purge_physical"))
  }

  // q179: iterated BPE tokenizer training --------------------------------

  /** Fixed merge-round budget — small enough for the oracle to replay
    * as a chained CTE (the q169/q173 pattern), large enough that later
    * rounds merge MULTI-char symbols built by earlier ones (the part
    * q94's single-round statistic can't see). */
  private[graft] val BpeRounds = 8

  /** Segmentation encoding shared verbatim by both engines: every
    * symbol wrapped in its own '|' sentinels (`|t1||t2||t3|`), so one
    * left-to-right `replace(s, '|x||y|', '|xy|')` IS the greedy
    * non-overlapping BPE merge — a match consumes its trailing '|',
    * leaving the next symbol's own opener in place, so back-to-back
    * pairs merge (`aaaa → aa aa`) while overlaps don't
    * (`aaa → aa a`), exactly the fold semantics, with no fold. Symbols
    * never contain '|' (fixture words are alphanumeric), so every
    * match is a full symbol-pair. Built as `(.) → |$1|` (each char
    * wrapped) rather than split(w, "") — Spark's split keeps a
    * trailing empty match (limit −1), which would corrupt the final
    * sentinel. */
  private def seg0(w: Column): Column =
    regexp_replace(w, "(.)", "|$1|")

  /** q179: the tokenizer-TRAINING loop, [[BpeRounds]] full BPE merge
    * rounds (Sennrich et al. 2016) — per round: adjacent-pair counts
    * over the current segmentation weighted by word frequency, argmax
    * by (count DESC, pair ASC), merge the winner everywhere, recount —
    * emitting the merge table (round, x, y, count-at-merge).
    *
    * Scale shape: the CORPUS is touched exactly once (the word-count
    * aggregation); all [[BpeRounds]] iterations run over the
    * Heaps'-law-small weighted vocabulary, each a vocab-sized explode +
    * map-combined count with a ONE-ROW collect (the argmax) and a
    * scalar-expression merge — the same driver-coordinated fixed-round
    * shape as q169's NN-descent, and exactly how production BPE
    * trainers structure the work (corpus pass → in-memory vocab loop).
    * The per-round localCheckpoint truncates the replace-chain lineage.
    * Deterministic (integer counts, lexicographic tiebreaks), so DuckDB
    * replays all 8 rounds as chained CTEs and the hash gate applies. */
  /** The training loop shared by q179 (emits the merge table) and q180
    * (emits the encoded corpus' statistics): returns the 8-round merge
    * list and the FINAL weighted vocabulary segmentation — the trained
    * tokenizer model and the corpus encoded with it, in one pass. */
  private[queries] def bpeTrain(s: SparkSession, d: String)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = Tables.documents(s, d)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), seg0(col("w")).as("s"))
      .localCheckpoint(true) // the one corpus-sized pass
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to BpeRounds if !exhausted) {
      val tops = vocab
        .withColumn("t", split(trim(col("s"), "|"), "\\|\\|"))
        .filter(size(col("t")) >= 2) // guard: sequence(1,0) steps DOWN
        .select(col("cnt"),
          explode(transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("x"),
              element_at(col("t"), i + 1).as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("x"), col("y"))
        .limit(1).collect() // bounded: the argmax row, once per round
      if (tops.isEmpty) {
        // vocabulary fully merged before the round budget (every word a
        // single symbol): stop with fewer rounds, keeping the final
        // segmentation — the oracle's LEFT-JOIN no-op rounds match
        exhausted = true
      } else {
        val top = tops(0)
        val (x, y, n) = (top.getString(0), top.getString(1), top.getLong(2))
        merges += ((r, x, y, n))
        // replacement side must stay literal too: Pattern.quote guards
        // the match, quoteReplacement guards '$'/'\' group semantics
        vocab = vocab.withColumn("s",
            regexp_replace(col("s"),
              lit(java.util.regex.Pattern.quote(s"|$x||$y|")),
              lit(java.util.regex.Matcher.quoteReplacement(s"|$x$y|"))))
          .localCheckpoint(true)
      }
    }
    (merges.result(), vocab)
  }

  def q179(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeTrain(s, d)._1.toDF("merge_round", "x", "y", "n")
      .select(col("merge_round").cast("int").as("merge_round"),
        col("x"), col("y"), col("n"))
      .orderBy(col("merge_round"))
  }

  /** q180: tokenizer APPLICATION — the corpus encoded with the trained
    * merges (the other half of train→apply; applying a tokenizer is
    * itself a first-class pipeline pass: every training run re-encodes
    * its corpus). The final segmentation falls out of the training
    * loop's last replace, so the emit is the SYMBOL TABLE of the
    * encoded corpus: top-20 symbols by frequency-weighted occurrence
    * (count DESC, symbol ASC) — multi-char merged symbols ranking
    * beside surviving single chars proves the merges actually applied.
    * Scale shape: identical to q179 (corpus pass + vocab-sized work);
    * at 100 TB the apply is a broadcast join of the Heaps'-small
    * (word → symbols) table onto the token stream, never a re-merge
    * per document. Oracle: the same 8-round CTE chain, final SELECT
    * over v8's exploded symbols. */
  def q180(s: SparkSession, d: String): DataFrame = {
    val (_, vocab) = bpeTrain(s, d)
    vocab
      .select(col("cnt"),
        explode(split(trim(col("s"), "|"), "\\|\\|")).as("tok"))
      .groupBy(col("tok")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q178_cdc_ingest" -> q178 _,
    "q179_bpe_train" -> q179 _,
    "q180_bpe_apply" -> q180 _
  )

  /** The 8-round CTE chain shared by the q179 and q180 oracles. */
  private def bpeChainSql: String =
    (1 to BpeRounds).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS (SELECT u.p.x AS x, u.p.y AS y, SUM(u.cnt) AS n
           FROM (SELECT cnt,
                        unnest(list_transform(generate_series(1, len(t) - 1),
                          i -> struct_pack(x := t[i], y := t[i + 1]))) AS p
                 FROM (SELECT cnt, string_split(trim(s, '|'), '||') AS t
                       FROM $prev) q$r
                 WHERE len(t) >= 2) u
           GROUP BY x, y),
         m$r AS (SELECT x, y, CAST(n AS BIGINT) AS n FROM p$r
                 ORDER BY n DESC, x, y LIMIT 1),
         v$r AS (SELECT w, cnt,
                        CASE WHEN m.x IS NULL THEN s
                             ELSE replace(s, '|' || m.x || '||' || m.y || '|',
                                             '|' || m.x || m.y || '|') END AS s
                 FROM $prev LEFT JOIN m$r m ON TRUE)"""
    }.mkString(",\n      ")

  private[queries] def bpeBaseSql: String =
    s"""WITH words AS (SELECT w, COUNT(*) AS cnt FROM (
             SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           GROUP BY w),
      v0 AS (SELECT w, cnt, regexp_replace(w, '(.)', '|\\1|', 'g') AS s
             FROM words),
      $bpeChainSql"""

  def oracle: Map[String, String] = Map(
    "q178_cdc_ingest" -> """
      SELECT CAST(1 AS INT) AS dup_rejected,
             CAST(1 AS INT) AS readd_accepted,
             CAST(1 AS INT) AS delete_hidden,
             CAST(1 AS INT) AS survivor_served,
             CAST(1 AS INT) AS purge_physical""",
    // the full 8-round replay: per round, pair counts over the current
    // segmentation, the argmax merge, and the merged vocabulary feeding
    // the next round — the engine's loop unrolled as chained CTEs
    "q179_bpe_train" -> s"""
      $bpeBaseSql
      SELECT merge_round, x, y, n FROM (
        ${(1 to BpeRounds).map(r =>
          s"SELECT $r AS merge_round, x, y, n FROM m$r").mkString("\n        UNION ALL ")})
      ORDER BY merge_round""",
    // the encoded corpus' symbol table: the same chain, read at v8
    "q180_bpe_apply" -> s"""
      $bpeBaseSql
      SELECT tok, CAST(SUM(cnt) AS BIGINT) AS n FROM (
        SELECT cnt, unnest(string_split(trim(s, '|'), '||')) AS tok
        FROM v$BpeRounds)
      GROUP BY tok ORDER BY n DESC, tok LIMIT 20"""
  )
}
