package graft

/** Diffs every registered query's canonical plan skeleton against the
  * checked-in golden file (see [[PlanSnapshot]]): a query edit that
  * changes any operator tree — a dropped broadcast, a new exchange, a
  * semi join silently becoming inner — fails HERE with a readable diff
  * instead of surfacing as a benchmark regression two rounds later.
  * Intentional plan changes regenerate the golden file
  * (`sbt 'runMain graft.PlanSnapshot'`) and ship the diff for review.
  */
class PlanSnapshotSpec extends SparkSpec {

  private lazy val golden: Map[String, Seq[String]] = {
    val src = scala.io.Source.fromFile(PlanSnapshot.GoldenPath, "UTF-8")
    try {
      val sections = scala.collection.mutable.Map[String, Vector[String]]()
      var cur: String = null
      src.getLines().foreach { line =>
        if (line.startsWith("== ")) { cur = line.drop(3).trim; sections(cur) = Vector() }
        else if (cur != null && !line.startsWith("#")) sections(cur) :+= line
      }
      sections.view.mapValues(_.toSeq).toMap
    } finally src.close()
  }

  test("golden file covers exactly the registered query set") {
    val registered = SparkEntry.queries.keySet
    val snapshotted = golden.keySet
    assert(registered == snapshotted,
      s"missing from golden: ${registered -- snapshotted}; stale in golden: " +
      s"${snapshotted -- registered} — regenerate with sbt 'runMain graft.PlanSnapshot'")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted)
    test(s"$name plan skeleton matches golden") {
      // other suites may leave tables cached in the shared session;
      // a cached input rewrites Scan(parquet) into InMemoryTableScan
      // and would fail the diff spuriously
      spark.catalog.clearCache()
      val plan = SparkEntry.queries(name)(spark, PlanSnapshot.SfDir)
        .queryExecution.executedPlan.toString
      val got = PlanSnapshot.skeleton(plan)
      val want = golden.getOrElse(name, Seq())
      if (got != want) {
        val diff = got.zipAll(want, "<missing>", "<missing>")
          .zipWithIndex.collect { case ((g, w), i) if g != w => s"  line $i: got '$g' want '$w'" }
        fail(s"$name plan drifted (regenerate golden if intentional):\n${diff.mkString("\n")}")
      }
    }
}
