package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Ad-hoc phase profiler for the graph queries (dev tool, not driver
  * contract): times the co-purchase edge build, each setup checkpoint, and
  * each power-iteration round separately, and prints the AQE-final plan of a
  * round body — the r16 evidence loop that found (a) the per-round edge-side
  * shuffle (checkpoints recorded UnknownPartitioning under AQE) and (b) that
  * the remaining round cost is the canonical O(|V|·P) dst-keyed partial-agg
  * exchange, not the joins. */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"GPROF $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    Tables.orders(spark, d).count(); Tables.lineitem(spark, d).count()
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val pairs = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"), col("l_suppkey"))
        .agg(count(lit(1)).cast("double").as("weight"))
        .select(concat(lit("c:"), col("o_custkey")).as("c"),
          concat(lit("s:"), col("l_suppkey")).as("s"), col("weight"))
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"), col("weight"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst"), col("weight")))
      val ranks = time("pageRank total")(
        graft.operators.Graph.pageRank(edges, iters = 5))
      time("final count")(ranks.count())
      if (rep == 2) {
        // AQE-final plan of one standalone round body over partitioned
        // checkpoints (join-strategy truth; collect() executes THIS Dataset's
        // queryExecution so executedPlan is the final adaptive plan)
        def staticCkpt(df: DataFrame): DataFrame = {
          val prev = spark.conf.get("spark.sql.adaptive.enabled")
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          try df.localCheckpoint()
          finally spark.conf.set("spark.sql.adaptive.enabled", prev)
        }
        val np = spark.sessionState.conf.numShufflePartitions
        val e0 = edges.select(col("src"), col("dst"), lit(1.0).as("w"))
          .filter(col("src").isNotNull && col("dst").isNotNull).localCheckpoint()
        val nodes = staticCkpt(e0.select(col("src").as("node"))
          .unionAll(e0.select(col("dst").as("node"))).distinct())
        val outw = staticCkpt(e0.groupBy(col("src")).agg(sum(col("w")).as("outw")))
        val e = staticCkpt(e0.repartition(np, col("src")).join(outw, Seq("src")))
        println("  e partitioning: " + e.queryExecution.executedPlan.outputPartitioning)
        val r0 = nodes.select(col("node"), lit(1.0).as("rank")).localCheckpoint()
        val contribs = e
          .join(r0.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("rank") * col("w") / col("outw")).as("contrib"))
        val body = nodes.join(contribs, Seq("node"), "left")
          .select(col("node"), coalesce(col("contrib"), lit(0.0)).as("rank"))
        time("round body")(body.collect())
        println(body.queryExecution.executedPlan.toString.take(4000))
      }
    }
    spark.stop()
  }
}
