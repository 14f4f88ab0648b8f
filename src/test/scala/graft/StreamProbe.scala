package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (test scope, not library code): where does a bounded streaming
  * verify query's wall-clock go? Prints per-batch durationMs from query
  * progress for the two most expensive w_* entries. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.sources.Sessions.builder(32)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.documents(spark, d).count()

    def probe(name: String): Unit = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      val n = df.count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"== $name: $n rows, total $total%.2f s")
      spark.streams.active.foreach(_.stop())
    }
    // progress listener: print per-batch durations
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"  batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    })
    Seq("w_stream_incremental_dedup", "w_stream_stream_join", "w1_stream_hour_counts")
      .foreach { n => probe(n); probe(n) }
    spark.stop()
  }
}
