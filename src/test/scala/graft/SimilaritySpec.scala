package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFns

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim unit vectors with hand-computable cosines
  private def emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(1.0f, 0.0f, 0.0f, 0.0f)),           // identical to 1
    (4L, Array(0.6f, 0.8f, 0.0f, 0.0f))            // cos with 1 = 0.6, with 2 = 0.8
  ).toDF("vec_id", "embedding")

  test("dot / l2 / cosine column functions") {
    val r = emb.filter($"vec_id" === 4).select(
      VectorFns.dot($"embedding", $"embedding"),
      VectorFns.l2Norm($"embedding")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)
  }

  test("cosineDupPairs returns all pairs at or above threshold, a_id < b_id") {
    val r = rowSet(Similarity.cosineDupPairs(emb, 0.5).select("a_id", "b_id", "cosine"))
    assert(r === Set(
      Seq(1L, 3L, 1.0),        // identical
      Seq(1L, 4L, 0.6),
      Seq(2L, 4L, 0.8),
      Seq(3L, 4L, 0.6)))       // 3 ≡ 1, so it pairs with 4 the same way
  }

  test("bruteForceTopK ranks by cosine desc with id tie-break, excludes self") {
    val r = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 1), 2)
    assert(rowList(r.select("vec_id", "rank")) === Seq(Seq(3L, 1), Seq(4L, 2)))
  }

  test("lshTopK finds identical vectors (same bucket in every table)") {
    val r = Similarity.lshTopK(emb, emb.filter($"vec_id" === 1), k = 2, dim = 4)
    val top = rowList(r.filter($"rank" === 1).select("vec_id")).flatten
    assert(top === Seq(3L), s"identical vector must be rank 1, got $top")
  }

  test("cosineDupPairsLsh finds identical pairs with exact scores, subset of all-pairs") {
    val lsh = rowSet(Similarity.cosineDupPairsLsh(emb, 0.5, dim = 4, nbits = 4)
      .select("a_id", "b_id", "cosine"))
    val all = rowSet(Similarity.cosineDupPairs(emb, 0.5).select("a_id", "b_id", "cosine"))
    assert(lsh.subsetOf(all), s"LSH produced a pair the exact form lacks: ${lsh -- all}")
    assert(lsh.contains(Seq(1L, 3L, 1.0)), "identical vectors share every bucket")
  }

  test("ivfTopK finds identical vectors (always the same cell) and excludes self") {
    val r = Similarity.ivfTopK(emb, emb.filter($"vec_id" === 1), k = 2, nlist = 2, nprobe = 1)
    val top = rowList(r.filter($"rank" === 1).select("vec_id")).flatten
    assert(top === Seq(3L), s"identical vector must be rank 1, got $top")
    assert(!rowList(r.select("vec_id")).flatten.contains(1L), "self-match must be excluded")
  }

  test("dot: a null ELEMENT nulls the result, matching the HOF form") {
    val df = Seq(
      (1L, Seq(Option(1.0), None, Option(3.0)), Seq(Option(1.0), Option(1.0), Option(1.0))),
      (2L, Seq(Option(1.0), Option(2.0)), Seq(Option(3.0), Option(4.0)))
    ).toDF("id", "a", "b")
    val r = df.select($"id", VectorFns.dot($"a", $"b").as("native"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
          .as("hof"))
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) null else row.getDouble(1),
          if (row.isNullAt(2)) null else row.getDouble(2))).toMap
    assert(r(1L) === ((null, null)), "null element must poison the product in BOTH forms")
    assert(r(2L) === ((11.0, 11.0)))
  }

  test("hyperplaneBucket is deterministic across invocations") {
    val b1 = emb.select(VectorFns.hyperplaneBucket($"embedding", 4, 8, 0).as("b"))
    val b2 = emb.select(VectorFns.hyperplaneBucket($"embedding", 4, 8, 0).as("b"))
    assert(rowList(b1) === rowList(b2))
  }
}
