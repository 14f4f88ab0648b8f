package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // ---- Naive Bayes: hand-fit semantics ------------------------------------

  private def nbDocs = Seq(
    (1L, "apple apple banana", "A"),
    (2L, "carrot carrot date", "B")
  ).toDF("doc_id", "text", "lang")

  test("naiveBayesSelf reproduces the hand-computed add-one-smoothed scores") {
    // vocab = {apple, banana, carrot, date}, |V| = 4; c_A = c_B = 3 tokens;
    // priors 1/2. doc1 under A: 2·ln(3/7) + ln(2/7) + ln(1/2); under B:
    // 3·ln(1/7) + ln(1/2). A wins (and symmetrically for doc2 under B).
    val r = Classify.naiveBayesSelf(nbDocs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getString(2) === "A" && r(1L).getBoolean(4))
    assert(r(2L).getString(2) === "B" && r(2L).getBoolean(4))
    val expected1 = 2 * math.log(3d / 7) + math.log(2d / 7) + math.log(0.5)
    assert(math.abs(r(1L).getDouble(3) - expected1) < 1e-5)
  }

  test("naiveBayesSelf breaks exact score ties to the smallest class") {
    // identical texts in two classes → fully symmetric model, scores tie
    // exactly → both docs predict class "a"
    val docs = Seq((1L, "same text", "a"), (2L, "same text", "b"))
      .toDF("doc_id", "text", "lang")
    val r = Classify.naiveBayesSelf(docs).collect()
      .map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r === Map(1L -> "a", 2L -> "a"))
  }

  test("naiveBayesSelf drops zero-token docs, keeps one row per scorable doc") {
    val docs = Seq((1L, "apple", "A"), (2L, "   ", "A"), (3L, "banana", "B"))
      .toDF("doc_id", "text", "lang")
    val r = Classify.naiveBayesSelf(docs)
    assert(r.select("doc_id").as[Long].collect().sorted === Array(1L, 3L))
    assert(r.count() === r.select("doc_id").distinct().count())
  }

  test("naiveBayesTransfer scores held-out docs with the frozen model, drops all-OOV docs") {
    val test = Seq(
      (10L, "apple", "A"),          // in-vocab: P(apple|A)=3/7 vs P(apple|B)=1/7
      (11L, "date carrot", "B"),
      (12L, "zzz qqq", "A")         // every token OOV → no row
    ).toDF("doc_id", "text", "lang")
    val r = Classify.naiveBayesTransfer(nbDocs, test).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet === Set(10L, 11L))
    assert(r(10L).getString(2) === "A" && r(10L).getBoolean(4))
    assert(r(11L).getString(2) === "B" && r(11L).getBoolean(4))
    val expected10 = math.log(3d / 7) + math.log(0.5)
    assert(math.abs(r(10L).getDouble(3) - expected10) < 1e-5)
  }

  test("naiveBayesTransfer on the training docs equals naiveBayesSelf") {
    // same corpus on both sides of the split → identical model → identical output
    val self = rowSet(Classify.naiveBayesSelf(nbDocs))
    val transfer = rowSet(Classify.naiveBayesTransfer(nbDocs, nbDocs))
    assert(self === transfer)
  }

  // ---- centroid classifier: hand-fit semantics ----------------------------

  test("centroidClassify assigns each vector to its nearest class mean") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (4L, Array(0.1f, 0.9f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Classify.centroidClassify(emb).collect()
    assert(r.length === 4)
    assert(r.forall(_.getBoolean(4)), s"every vec nearest its own class mean: ${r.mkString(", ")}")
  }

  test("centroidClassify breaks exact cosine ties to the smallest label") {
    // identical single vectors in classes 0 and 1 → identical centroids →
    // both cands tie at cos 1 → both vecs predict label 0
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Classify.centroidClassify(emb).collect()
      .map(x => x.getLong(0) -> x.getInt(2)).toMap
    assert(r === Map(1L -> 0, 2L -> 0))
  }

  // ---- kNN majority vote: planted-cluster semantics ------------------------

  test("knnClassify recovers planted clusters exactly (k=3)") {
    // two tight clusters; every vector's 3 nearest are its own cluster-mates
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(0.99f, -0.1f, 0.0f, 0.0f), 0),
      (4L, Array(0.98f, 0.0f, 0.1f, 0.0f), 0),
      (5L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (6L, Array(0.1f, 0.99f, 0.0f, 0.0f), 1),
      (7L, Array(-0.1f, 0.99f, 0.0f, 0.0f), 1),
      (8L, Array(0.0f, 0.98f, 0.1f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Classify.knnClassify(emb, k = 3).collect()
    assert(r.length === 8)
    assert(r.forall(_.getBoolean(4)), s"planted clusters must classify perfectly: ${r.mkString(", ")}")
    assert(r.forall(_.getLong(3) === 3L), "all 3 votes from the home cluster")
  }

  test("knnClassify vote ties break to the closest neighbor, then smallest label") {
    // query 1 sees neighbors 2 (label 7) and 3 (label 4) at the SAME cosine
    // (0.8): neighbor rank ties break by vec_id → 2 is rank 1, so the 1-1
    // vote tie resolves to label 7 via best_rank
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 9),
      (2L, Array(0.8f, 0.6f, 0.0f, 0.0f), 7),
      (3L, Array(0.8f, -0.6f, 0.0f, 0.0f), 4)
    ).toDF("vec_id", "embedding", "label")
    val r = Classify.knnClassify(emb, k = 2).collect()
      .map(x => x.getLong(0) -> x.getInt(2)).toMap
    assert(r(1L) === 7)
  }

  test("knnClassifyIvf agrees with the exact form on most fixture predictions") {
    // the IVF probe misses some true neighbors (recall@10 = 0.905 at these
    // params), so votes can differ — agreement rate is the quality gate
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Classify.knnClassify(emb, k = 5)
      .select(col("vec_id"), col("pred_label").as("p_exact"))
    val ivf = Classify.knnClassifyIvf(emb, k = 5)
      .select(col("vec_id"), col("pred_label").as("p_ivf"))
    val joined = exact.join(ivf, "vec_id")
    val n = joined.count().toDouble
    val agree = joined.filter(col("p_exact") === col("p_ivf")).count() / n
    info(f"IVF/exact kNN prediction agreement = $agree%.3f over ${n.toLong} vecs")
    assert(agree >= 0.6, f"agreement $agree%.3f below 0.6 floor — resize nlist/nprobe")
  }

  // ---- accuracy gates on the fixture (quality evidence, chance = 1/classes)

  test("naiveBayesSelf fixture self-accuracy >= 0.35 (chance 0.20)") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val r = Classify.naiveBayesSelf(docs)
      .agg(avg(col("correct").cast("double"))).head().getDouble(0)
    info(f"NB self-accuracy = $r%.3f")
    assert(r >= 0.35, f"NB self-accuracy $r%.3f below 0.35 floor (chance 0.20)")
  }

  test("centroidClassify fixture self-accuracy >= 0.30 (chance 0.10)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val r = Classify.centroidClassify(emb)
      .agg(avg(col("correct").cast("double"))).head().getDouble(0)
    info(f"centroid self-accuracy = $r%.3f")
    assert(r >= 0.30, f"centroid self-accuracy $r%.3f below 0.30 floor (chance 0.10)")
  }

  test("calibrationBins: known softmax confidences land in the right bins") {
    import spark.implicits._
    val scores = Seq(
      // doc 1: conf(a) = 1/(1+1/9) = 0.9 -> bin 9, correct
      (1L, "a", "a", 0.0), (1L, "a", "b", -math.log(9.0)),
      // doc 2: exact tie -> winner a (cand asc), conf 0.5 -> bin 5, wrong
      (2L, "b", "a", 0.0), (2L, "b", "b", 0.0)
    ).toDF("doc_id", "lang", "cand", "nb_score")
    val r = Classify.calibrationBins(scores, bins = 10).collect()
      .map(x => x.getInt(0) -> (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r === Map(9 -> ((1L, 0.9, 1.0)), 5 -> ((1L, 0.5, 0.0))), s"got $r")
  }

  test("classificationMetrics: per-class P/R/F1 from a hand confusion matrix") {
    import spark.implicits._
    val scored = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), // a: support 3, tp 2
      ("b", "a"), ("b", "b"),             // b: support 2, tp 1
      ("c", "a")                          // c: support 1, tp 0, never predicted
    ).toDF("lang", "pred_lang")
    val r = Classify.classificationMetrics(scored).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3),
          x.getDouble(4), x.getDouble(5), x.getDouble(6))).toMap
    assert(r("a") === ((3L, 4L, 2L, 0.5, 0.666667, 0.571429)), s"a: ${r("a")}")
    assert(r("b") === ((2L, 2L, 1L, 0.5, 0.5, 0.5)))
    // zero-division convention: unpredicted class scores precision 0, f1 0
    assert(r("c") === ((1L, 0L, 0L, 0.0, 0.0, 0.0)))
  }

  test("hardNegatives mines the infiltrator, never a same-label vector") {
    // cluster A (label 0) + one label-1 vector planted INSIDE it: every
    // label-0 anchor's hardest negative must be the infiltrator (9), not the
    // distant label-1 cluster; label filter excludes all cluster-mates
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f), 0),
      (3L, Array(0.99f, -0.1f, 0.0f, 0.0f), 0),
      (9L, Array(0.97f, 0.05f, 0.2f, 0.0f), 1), // the infiltrator
      (5L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (6L, Array(0.1f, 0.99f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    // corpus-as-anchors now needs the explicit opt-in (r12 verdict ask #8):
    // an un-acknowledged None must fail loudly BEFORE any plan is built
    intercept[IllegalArgumentException] {
      Classify.hardNegatives(emb, k = 2, queries = None)
    }
    val rows = Classify.hardNegatives(emb, k = 2, queries = None, exactOracleOk = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byAnchor = rows.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toList)
    for (a <- Seq(1L, 2L, 3L))
      assert(byAnchor(a).head === 9L, s"anchor $a hardest: ${byAnchor(a)}")
    // no same-label pair anywhere
    val labels = Map(1L -> 0, 2L -> 0, 3L -> 0, 9L -> 1, 5L -> 1, 6L -> 1)
    assert(rows.forall { case (q, n, _) => labels(q) != labels(n) }, rows.mkString(","))
    // rank 1 = hardest = highest cosine (anchor 9's are its A-cluster hosts)
    assert(byAnchor(9L).toSet.subsetOf(Set(1L, 2L, 3L)))
    // the IVF twin keeps the driver-gated recall on the real fixture
    val fix = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Classify.hardNegatives(fix, k = 5, queries = None, exactOracleOk = true)
      .select("query_id", "vec_id")
    val ivf = Classify.hardNegativesIvf(fix, k = 5).select("query_id", "vec_id")
    val recall = ivf.join(exact, Seq("query_id", "vec_id"), "left_semi").count()
      .toDouble / exact.count()
    info(f"hardNegativesIvf recall@5 = $recall%.3f")
    assert(recall >= 0.75, f"IVF hard-negative recall $recall%.3f below 0.75")
  }
}
