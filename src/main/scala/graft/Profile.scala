package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.sources.Tables

/** Ad-hoc stage profiler (dev tool, not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, d)
    docs.count() // warm
    time("normalize only") {
      docs.select(TextFns.normalize(col("text")).as("n")).filter(length(col("n")) > 0).count()
    }
    time("tokens") {
      docs.select(size(TextFns.tokens(col("text"))).as("n")).filter(col("n") > 0).count()
    }
    time("shingles") {
      docs.select(size(TextFns.wordShingles(col("text"), 3)).as("n")).filter(col("n") >= 0).count()
    }
    time("shingles distinct") {
      docs.select(size(array_distinct(TextFns.wordShingles(col("text"), 3))).as("n"))
        .filter(col("n") >= 0).count()
    }
    time("grams + block projection") {
      docs.select(col("doc_id"),
        substring(TextFns.normalize(col("text")), 1, 40).as("block"),
        array_distinct(TextFns.wordShingles(col("text"), 3)).as("grams"))
        .filter(size(col("grams")) >= 0).count()
    }
    time("full ngramJaccardPairs") {
      graft.operators.Dedup.ngramJaccardPairs(docs, 3, 40, 0.3).count()
    }
    time("minhash: shingle explode+hash") {
      docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(array_distinct(TextFns.shinglesFromTokens(col("toks"), 3))).as("s"))
        .select(xxhash64(col("s")).as("h")).filter(col("h").isNotNull).count()
    }
    time("minhash: sigs OLD 64-min-col form") {
      val hashed = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(array_distinct(TextFns.shinglesFromTokens(col("toks"), 3))).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("h"))
      val aggs = (0 until 64).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
      hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).count()
    }
    time("full minhashLshPairs") {
      graft.operators.Dedup.minhashLshPairs(docs, threshold = 0.2).count()
    }
    time("full simhashPairs") {
      graft.operators.Dedup.simhashPairs(docs, maxHamming = 16).count()
    }
    spark.stop()
  }
}
