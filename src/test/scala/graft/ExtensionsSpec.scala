package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions are reachable from plain SQL through
  * SparkSessionExtensions — its own session (extensions bind at build time). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would silently return the suite-shared session WITHOUT the
    // extensions; clear the default so a sibling session (same SparkContext,
    // own extensions) is built, then restore the shared one for later suites.
    val base = SparkSpec.session
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    s
  }

  test("graft_dot from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r === 32.0)
  }

  test("graft_minhash_sig from SQL: deterministic k-length signature") {
    val sig = spark.sql(
      """SELECT graft_minhash_sig(h, 8) AS sig FROM
         (SELECT xxhash64(x) AS h FROM (SELECT explode(array('a','b','c')) AS x))""")
      .head().getSeq[Long](0)
    assert(sig.length === 8)
    val again = spark.sql(
      """SELECT graft_minhash_sig(h, 8) AS sig FROM
         (SELECT xxhash64(x) AS h FROM (SELECT explode(array('c','a','b')) AS x))""")
      .head().getSeq[Long](0)
    assert(sig === again) // order-insensitive (min is commutative)
  }

  test("graft_top_k from SQL: best-first bounded top-k") {
    val rows = spark.sql(
      """SELECT graft_top_k(s, i, 2) AS top FROM VALUES
         (0.5d, 1L), (0.9d, 2L), (0.7d, 3L), (0.9d, 0L) AS t(s, i)""")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(rows.map(r => (r.getDouble(0), r.getLong(1))) ===
      Seq((0.9, 0L), (0.9, 2L)))   // score desc, id asc tie-break
  }

  test("graft_arg_max from SQL: payload of the greatest ordering, null ord never wins") {
    val r = spark.sql(
      """SELECT graft_arg_max(ts, name) AS winner FROM VALUES
         (TIMESTAMP'2024-01-01 10:00:00', 'older'),
         (TIMESTAMP'2024-01-02 10:00:00', 'newest'),
         (CAST(NULL AS TIMESTAMP), 'null-ts') AS t(ts, name)""")
      .head().getString(0)
    assert(r === "newest")
  }

  test("graft_edit_distance from SQL: within-threshold distance, -1 past it") {
    val r = spark.sql(
      """SELECT graft_edit_distance('kitten', 'sitting', 3) AS d,
                graft_edit_distance('kitten', 'sitting', 2) AS over""")
      .head()
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === -1)
  }

  test("graft_edit_distance: an effectively-unbounded threshold still measures, never -1") {
    // k near Int.MaxValue must clamp (band arithmetic would overflow and
    // return -1 for EVERY pair, silently inverting the contract)
    val r = spark.sql(
      s"SELECT graft_edit_distance('kitten', 'sitting', ${Int.MaxValue}) AS d").head()
    assert(r.getInt(0) === 3)
  }
}
