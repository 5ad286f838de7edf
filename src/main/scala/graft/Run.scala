package graft
import org.apache.spark.sql.SparkSession

/** Iteration aid: run named queries at a given fixture, print up to 20
  * result rows and a min-of-N wall time (noop sink, the Bench contract).
  * Usage: runMain graft.Run [sfDir] [q...]   (env SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_RUNS to override parallelism / timing repeats). */
object Run {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val head = SparkEntry.queries(n)(spark, sfDir).limit(20).collect()
        spark.catalog.clearCache()
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          dt
        }
        println(f"===== $n  min=${times.min}%.3fs  (${times.map(t => f"$t%.3f").mkString(",")})")
        head.foreach(r => println(s"  $r"))
      } catch { case e: Throwable =>
        println(s"===== $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
