package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink coverage beyond the parquet fixtures (SURVEY.md §2.1):
  * text, CSV, JSON round-trips; dynamic destinations via partitionBy;
  * glob reads (Beam MatchFiles); Impulse. */
class IoSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_io").toString

  test("text round-trip (ReadFromText/WriteToText)") {
    import spark.implicits._
    val dir = tmp() + "/t"
    val lines = Seq("alpha", "beta", "gamma")
    lines.toDF("value").write.text(dir)
    val back = spark.read.text(dir).as[String].collect().sorted
    assert(back.toSeq == lines.sorted)
  }

  test("csv round-trip with header and schema") {
    val dir = tmp() + "/c"
    val df = Tables.region(spark, sf("sf0.001"))
    df.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == df.count())
    assert(back.columns.toSeq == df.columns.toSeq)
  }

  test("json round-trip preserves nested structs") {
    val dir = tmp() + "/j"
    val df = Tables.nation(spark, sf("sf0.001"))
      .select(struct(col("n_nationkey"), col("n_name")).as("rec"), col("n_regionkey"))
    df.write.json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == df.count())
    assert(back.select("rec.n_name").distinct().count() ==
      df.select("rec.n_name").distinct().count())
  }

  test("partitionBy write = dynamic destinations; glob read = MatchFiles") {
    val dir = tmp() + "/p"
    Tables.documents(spark, sf("sf0.001"))
      .write.partitionBy("lang").parquet(dir)
    // each lang lands in its own directory
    val langs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langs.length == 5, langs.mkString(","))
    // glob-select a subset of destinations
    val two = spark.read.parquet(s"$dir/lang=en", s"$dir/lang=de")
    val full = Tables.documents(spark, sf("sf0.001"))
    assert(two.count() ==
      full.filter(col("lang").isin("en", "de")).count())
    // partition pruning on the full read
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(pruned.count() == full.filter(col("lang") === "en").count())
  }

  test("impulse: single-element kickoff") {
    assert(spark.range(1).count() == 1)
  }

  test("binary payload survives a parquet round-trip") {
    val dir = tmp() + "/b"
    val df = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    df.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName == "binary")
    val diff = back.join(df.withColumnRenamed("payload", "orig"), "doc_id")
      .filter(col("payload") =!= col("orig")).count()
    assert(diff == 0)
  }
}
