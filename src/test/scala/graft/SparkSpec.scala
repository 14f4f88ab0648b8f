package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared session base for all specs — same config surface as Verify/Bench
  * (UTC, ANSI off, ns-as-long parquet), small local parallelism. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  import java.sql.Timestamp

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Collect to a set of row value-seqs for order-insensitive exact comparison. */
  def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def rowList(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = graft.sources.Sessions.builder(4)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Canonical tiny event fixture shared by view/operator specs. */
case class TestEvent(event_id: Long, user_id: Long, event_type: String,
                     ts: java.sql.Timestamp, value: Double, props: String)
