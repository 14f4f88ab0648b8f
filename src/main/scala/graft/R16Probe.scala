package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev-only measurement harness for the r16 optimization round (guide §1:
  * measure first). Times candidate shapes side by side with the noop sink so
  * the comparison isolates compute, not the sink. Not part of the driver
  * contract. */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.sources.Sessions.builder(cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = if (args.isEmpty) Set("scan") else args.toSet

    def time(name: String, reps: Int = 3)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-44s min ${ts.min}%7.3f s  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (which("scan")) {
      val emb = Tables.embeddings(spark, d)
      println(s"embeddings scan partitions: ${emb.rdd.getNumPartitions}")
      time("knn_classify as-is") { noop(graft.operators.Classify.knnClassify(emb, k = 5)) }
      time("knn_classify corpus repart32") {
        noop(graft.operators.Classify.knnClassify(emb.repartition(cpus, col("vec_id")), k = 5))
      }
      val docs = Tables.documents(spark, d)
      println(s"documents scan partitions: ${docs.rdd.getNumPartitions}")
      time("dedup_simhash as-is") { noop(graft.operators.Dedup.simhashPairs(docs, maxHamming = 16)) }
      time("dedup_simhash docs repart32") {
        noop(graft.operators.Dedup.simhashPairs(docs.repartition(cpus, col("doc_id")), maxHamming = 16))
      }
      val li = Tables.lineitem(spark, d)
      println(s"lineitem scan partitions: ${li.rdd.getNumPartitions}")
      time("lineitem groupagg as-is") {
        noop(li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"), avg("l_discount"), count(lit(1))))
      }
      time("lineitem groupagg repart32") {
        noop(li.repartition(cpus, col("l_orderkey")).groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"), avg("l_discount"), count(lit(1))))
      }
    }
    spark.stop()
  }
}
