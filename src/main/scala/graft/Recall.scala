package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iteration aid: recall@5 of the kNN-graph queries vs exact brute
  * force at a fixture. Usage: runMain graft.Recall [sfDir] [q...] */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q168_knn_graph", "q169_knn_converged")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.ensure(spark)
    // exact top-5 per node by (cos bp desc, id asc) — brute force
    val b = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val gt = b.as("x").join(b.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("src"), col("y.vec_id").as("nb"),
        floor(call_function("cosine_sim", col("x.v"), col("y.v")) * 10000)
          .cast("long").as("sim"))
      .groupBy(col("src"))
      .agg(call_function("collect_topk",
        struct((-col("sim")).as("nsim"), col("nb")), lit(5), lit(true)).as("t"))
      .select(col("src").as("vec_id"), explode(col("t.nb")).as("nb_id"))
    gt.persist(); val denom = gt.count()
    names.foreach { n =>
      val t0 = System.nanoTime()
      val out = SparkEntry.queries(n)(spark, sfDir)
        .select(col("vec_id"), col("nb_id"))
      val hits = out.join(gt, Seq("vec_id", "nb_id"), "left_semi").count()
      println(f"RECALL $n recall@5=${hits.toDouble / denom}%.4f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
    spark.stop()
  }
}
