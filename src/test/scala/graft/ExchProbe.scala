package graft

/** Dev tool (test scope): print the finalized-plan exchange count and
  * cartesian flag for named entries — the numbers PlanSpec's regression gate
  * pins. Run: `sbt "Test/runMain graft.ExchProbe <query> [query ...]"`. */
object ExchProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder(4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      println(s"PROBE $name exchanges=" +
        s"${"Exchange hashpartitioning".r.findAllIn(p).size} " +
        s"cartesian=${p.contains("CartesianProduct")}")
    }
    spark.stop()
  }
}
