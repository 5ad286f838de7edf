package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iteration aid: recall@5 of the kNN-graph / ANN-serving queries vs
  * exact brute force at a fixture. Node-style queries (vec_id/nb_id
  * output — q168/q169) compare against the full n² ground truth;
  * serving-style queries (q_id/vec_id output — q171/q173) against the
  * 8-query × corpus ground truth, which stays linear in n and is the
  * only exact baseline computable at the probe scales (n² at sf100
  * would be 4·10¹² pairs). Usage: runMain graft.Recall [sfDir] [q...] */
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
    val b = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    def cosBp(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      floor(call_function("cosine_sim", x, y) * 10000).cast("long")
    def top5(cand: org.apache.spark.sql.DataFrame, key: String) =
      cand.groupBy(col(key))
        .agg(call_function("collect_topk",
          struct((-col("sim")).as("nsim"), col("nb")), lit(5), lit(true)).as("t"))
        .select(col(key), explode(col("t.nb")).as("nb_id"))
    // exact top-5 per node by (cos bp desc, id asc) — full brute force
    lazy val gtNode = {
      val g = top5(b.as("x").join(b.as("y"), col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nb"),
          cosBp(col("x.v"), col("y.v")).as("sim")), "vec_id")
      g.persist(); (g, g.count())
    }
    // exact top-5 per QUERY (vec_id < 8, the serving-family convention):
    // one broadcast pass over the corpus, linear in n
    lazy val gtQuery = {
      val qs = b.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val g = top5(b.join(broadcast(qs), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("nb"),
          cosBp(col("qv"), col("v")).as("sim")), "q_id")
      g.persist(); (g, g.count())
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val out = SparkEntry.queries(n)(spark, sfDir)
      val (hits, denom) =
        if (out.columns.contains("q_id")) {
          val (gt, d) = gtQuery
          (out.select(col("q_id"), col("vec_id").as("nb_id"))
            .join(gt, Seq("q_id", "nb_id"), "left_semi").count(), d)
        } else {
          val (gt, d) = gtNode
          (out.select(col("vec_id"), col("nb_id"))
            .join(gt, Seq("vec_id", "nb_id"), "left_semi").count(), d)
        }
      println(f"RECALL $n recall@5=${hits.toDouble / denom}%.4f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
    spark.stop()
  }
}
