package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{LlmQueries, Round10Queries, Round11Queries}
import graft.streaming.Streaming

/** Ingest-loop throughput curve (round-16 verdict ask #5): the composed
  * production path [[Streaming.ingestLoop]] measured end to end —
  * docs/sec at several (corpus size × drop size) points, plus the
  * per-artifact maintenance primitives timed in isolation on the same
  * drop so the report names WHICH artifact dominates the batch.
  *
  * Usage: runMain graft.BenchIngest <fixtureDir> <nBase> <drop1,drop2,...>
  * Prints one JSON line per (corpus, drop) point:
  *   {"metric":"ingest","corpus":N,"drop":K,"loop_sec":S,
  *    "docs_per_sec":R,"parts":{"gate":...,"band_append":...,
  *    "annidx_append":...,"graph_append":...}}
  *
  * The standing state is built once per invocation (the write-once
  * production artifact); only the MAINTAINED path is timed. Drops are
  * REAL fixture rows disjoint from the base slice (fresh text and
  * vectors), so the gate does genuine near-dup work and the appends do
  * genuine geometry.
  */
object BenchIngest {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val nBase = args(1).toInt
    val dropSizes = args(2).split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.ensure(spark)
    import spark.implicits._

    val toD = (c: org.apache.spark.sql.Column) => transform(c, _.cast("double"))
    // joined (doc_id, text, label, v) domain, ORDERED by a dense rank so
    // "first nBase" and "next k" are well-defined on offset-scaled ids
    val joined = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .join(Tables.embeddings(spark, d)
          .select(col("vec_id"), col("label"), toD(col("embedding")).as("v")),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("label").cast("int").as("label"), col("v"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
      .localCheckpoint(true)
    val base = joined.filter(col("rk") <= nBase).drop("rk").localCheckpoint(true)
    val maxDrop = dropSizes.max
    val pool = joined.filter(col("rk") > nBase && col("rk") <= nBase + maxDrop)
      .localCheckpoint(true)
    val total = joined.count()
    require(total >= nBase + maxDrop,
      s"fixture has $total joined rows, need ${nBase + maxDrop}")

    val baseVecs = base.select(col("doc_id").as("vec_id"), col("v"))
      .localCheckpoint(true)
    val cents = LlmQueries.ivfCentroids(baseVecs)
    val cb = LlmQueries.pqCodebook(baseVecs)
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // standing state built ONCE per fixture: the loop never mutates the
    // shared frames (it REPLACES its state references batch to batch) —
    // only the on-disk annidx layout mutates, and each point gets its
    // own file-level copy of the template
    val idxState = Streaming.indexFromSigs(
      Streaming.buildNearDupIndex(base.select(col("doc_id"), col("text")), 64)
        .sigs.localCheckpoint(true), 64)
    val template = java.nio.file.Files.createTempDirectory("graft_bi_tpl")
    val tplIdx = template.toString + "/annidx"
    Round10Queries.annIndexRows(
        base.select(col("doc_id").as("vec_id"), col("label"), col("v")),
        cents, cb)
      .repartition(8).write.parquet(tplIdx)
    val g0 = Round11Queries.knnGraphBuild(baseVecs, 15, 30, rounds = 1)
      .select(col("src"), col("nb"), col("sim")).localCheckpoint(true)

    dropSizes.foreach { k =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_bi")
      val idxPath = tmp.toString + "/annidx"
      locally {
        import scala.jdk.CollectionConverters._
        val src = java.nio.file.Paths.get(tplIdx)
        val dst = java.nio.file.Paths.get(idxPath)
        java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
          java.nio.file.Files.copy(p, dst.resolve(src.relativize(p).toString))
        }
      }
      val drop = pool.filter(col("rk") <= nBase + k).drop("rk").localCheckpoint(true)
      val dropDocs = drop.select(col("doc_id"), col("text")).localCheckpoint(true)
      val dropVecs = drop.select(col("doc_id").as("vec_id"), col("v"))
        .localCheckpoint(true)

      // per-artifact primitives in isolation (same drop, same state)
      val (_, tGate) = timed {
        Streaming.nearDupProbe(idxState, dropDocs).write
          .format("noop").mode("overwrite").save()
      }
      val (_, tBand) = timed {
        Streaming.appendToIndex(idxState, dropDocs, 64)
          .sigs.write.format("noop").mode("overwrite").save()
      }
      val (_, tAnn) = timed {
        Round10Queries.appendToAnnIndex(
          drop.select(col("doc_id").as("vec_id"), col("label"), col("v")),
          idxPath, cents, cb)
      }
      val (_, tGraph) = timed {
        Round11Queries.appendToKnnGraph(g0, baseVecs, dropVecs, 15, 30)
          .write.format("noop").mode("overwrite").save()
      }

      // the composed loop, one streaming micro-batch of k docs
      val st = new Streaming.IngestState(
        idxState, idxPath, g0, baseVecs, cents, cb)
      implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Streaming.IngestDoc]
      val q = Streaming.ingestLoop(mem.toDF(), st, bandCap = 64, kInt = 15,
        undCap = 30, compactEvery = 0, compactTarget = 64L << 20)
      val rows = drop.collect().map(r => Streaming.IngestDoc(
        r.getLong(0), r.getString(1), r.getInt(2), r.getSeq[Double](3)))
      val (_, tLoop) = timed {
        mem.addData(rows.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      q.stop()
      // force the lazily-checkpointed post-batch artifacts so the loop
      // number includes every deferred append materialization
      val (_, tSettle) = timed {
        st.graph.write.format("noop").mode("overwrite").save()
        st.corpus.write.format("noop").mode("overwrite").save()
      }
      val loopTotal = tLoop + tSettle
      println(f"""{"metric":"ingest","fixture":"$d","corpus":$nBase,"drop":$k,""" +
        f""""loop_sec":$loopTotal%.3f,"docs_per_sec":${k / loopTotal}%.1f,""" +
        f""""parts":{"gate":$tGate%.3f,"band_append":$tBand%.3f,""" +
        f""""annidx_append":$tAnn%.3f,"graph_append":$tGraph%.3f}}""")
      // cleanup
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
