package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Dev tool for the r16 optimization round: write `explain("formatted")` for
  * the named queries to `plans/r16/<name>_<suffix>.txt` — the before/after
  * plan evidence the round's deliverables require. Usage:
  * `sbt "runMain graft.R16Plans before q_pagerank q_label_propagation"`.
  * Batch queries only (a streaming entry would execute its stream just to
  * build the settled frame; its plan story lives in PLANS.md instead). */
object R16Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R16Plans <suffix> <query> [query ...]")
    val suffix = args.head
    val names = args.tail.toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.sources.Sessions.builder(4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r16"))
    names.foreach { n =>
      // The graph queries localCheckpoint each round, so the declared query's
      // plan is one ExistingRDD scan; capture the UNROLLED round tree instead
      // (checkpoint = false — the same switch PlanSpec uses), which is the
      // plan each round actually runs.
      val df = n match {
        case "q_pagerank" => graft.operators.Graph.pageRank(
          SparkEntry.graphEdgesFor(spark, d), iters = 1, checkpoint = false)
        case "q_pagerank_weighted" => graft.operators.Graph.pageRank(
          SparkEntry.graphEdgesFor(spark, d), iters = 1, weightCol = "weight",
          checkpoint = false)
        case "q_label_propagation" => graft.operators.Graph.labelPropagate(
          SparkEntry.graphEdgesFor(spark, d),
          SparkEntry.graphSeedsFor(spark, d), iters = 1, checkpoint = false)
        case _ => SparkEntry.queries(n)(spark, d)
      }
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"plans/r16/${n}_$suffix.txt"), txt)
      println(s"[r16plans] wrote plans/r16/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
