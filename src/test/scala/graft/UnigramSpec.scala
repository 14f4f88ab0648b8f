package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

/** Unigram-LM tokenizer (Kudo 2018): EM training invariants, Viterbi decode
  * exactness (hand-built lattices), and the determinism contract. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDocs =
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  // pinned vocabulary with a hand-checkable Viterbi optimum
  private val pinned = Seq(
    Unigram.Piece("er", -3.0), Unigram.Piece("an", -3.0),
    Unigram.Piece("in", -3.0), Unigram.Piece("on", -3.0),
    Unigram.Piece("ly", -3.0), Unigram.Piece("ch", -3.0))

  test("Viterbi decode uses every piece occurrence under the pinned vocabulary") {
    // occurrences are provably unique and non-overlapping for this piece set
    // (distinct first chars; suffix/prefix sets disjoint — the
    // text_unigram_encode_fixed argument), so the optimum is exact
    val toks = Seq((1L, "channel inland pony early"))
      .toDF("doc_id", "text")
      .select(Unigram.encode(col("text"), pinned).as("t"))
      .head().getSeq[String](0)
    // channel -> ch|an|n|e|l ; inland -> in|l|an|d ; pony -> p|on|y ;
    // early -> e|a|r|ly  ("er" never occurs; "ly" only in early)
    assert(toks === Seq("ch", "an", "n", "e", "l", "in", "l", "an", "d",
      "p", "on", "y", "e", "a", "r", "ly"))
  }

  test("Viterbi prefers higher-probability segmentations, not greedy longest-match") {
    // vocab where greedy longest-match from the left is suboptimal:
    // word "abc": greedy takes "ab" (-5) then "c" (-6) = -11;
    // Viterbi must take "a" (-6) + "bc" (-1) = -7
    val vocab = Seq(Unigram.Piece("ab", -5.0), Unigram.Piece("bc", -1.0),
      Unigram.Piece("a", -6.0), Unigram.Piece("b", -6.0), Unigram.Piece("c", -6.0))
    val toks = Seq((1L, "abc")).toDF("doc_id", "text")
      .select(Unigram.encode(col("text"), vocab).as("t"))
      .head().getSeq[String](0)
    assert(toks === Seq("a", "bc"))
  }

  test("Viterbi tie-break is deterministic toward the longest final piece") {
    // "ab" (-4) exactly equals "a"+"b" (-2 + -2): the longest-final-piece
    // rule must pick the single piece, every run
    val vocab = Seq(Unigram.Piece("ab", -4.0),
      Unigram.Piece("a", -2.0), Unigram.Piece("b", -2.0))
    (1 to 3).foreach { _ =>
      val toks = Seq((1L, "ab")).toDF("doc_id", "text")
        .select(Unigram.encode(col("text"), vocab).as("t"))
        .head().getSeq[String](0)
      assert(toks === Seq("ab"))
    }
  }

  test("unknown characters segment as single-char unk pieces (total coverage)") {
    val toks = Seq((1L, "zq#7")).toDF("doc_id", "text")
      .select(Unigram.encode(col("text"), pinned).as("t"))
      .head().getSeq[String](0)
    assert(toks === Seq("z", "q", "#", "7"))
  }

  test("trainVocab: size target, char coverage, normalized probs, EM likelihood climbs") {
    val r = Unigram.trainVocab(fixtureDocs, vocabSize = 120)
    assert(r.pieces.size === 120, s"expected exactly 120 pieces, got ${r.pieces.size}")
    // single-char pieces cover every char of every piece (no unks on corpus)
    val singles = r.pieces.map(_.piece).filter(_.length == 1).toSet
    assert(r.pieces.forall(_.piece.forall(c => singles(c.toString))))
    // unigram distribution sums to 1
    val z = r.pieces.map(p => math.exp(p.logProb)).sum
    assert(math.abs(z - 1.0) < 1e-9, s"probs must normalize, got $z")
    // the EM guarantee: within each fixed-vocabulary phase the corpus
    // log-likelihood never decreases
    r.llTrace.foreach { phase =>
      phase.lazyZip(phase.drop(1)).foreach { (a, b) =>
        assert(b >= a - math.abs(a) * 1e-9,
          s"EM log-likelihood decreased within a phase: $a -> $b")
      }
    }
    // multi-char pieces were actually learned (the point of the fit)
    assert(r.pieces.exists(_.piece.length > 1),
      "trained vocabulary must contain multi-char pieces")
  }

  test("trainVocab is deterministic across runs") {
    val a = Unigram.trainVocab(fixtureDocs, vocabSize = 100)
    val b = Unigram.trainVocab(fixtureDocs, vocabSize = 100)
    assert(a.pieces === b.pieces)
    assert(a.llTrace === b.llTrace)
  }

  test("trained encode round-trips content and compresses against char-splitting") {
    val docs = fixtureDocs
    val pieces = Unigram.trainVocab(docs, vocabSize = 150).pieces
    val rows = docs.limit(50)
      .select(graft.functions.TextFns.normalize(col("text")).as("norm"),
        Unigram.encode(col("text"), pieces).as("toks"))
      .collect()
    rows.foreach { r =>
      val norm = r.getString(0).replace(" ", "")
      val toks = r.getSeq[String](1)
      assert(toks.mkString("") === norm,
        "piece concatenation must reproduce the normalized text")
      assert(toks.size < norm.length,
        "trained pieces must beat pure character segmentation")
    }
  }

  test("tokenCounts matches encode sizes; piecesTable round-trips the vocabulary") {
    val pieces = Seq(Unigram.Piece("ab", -1.0), Unigram.Piece("a", -2.0),
      Unigram.Piece("b", -2.0))
    val docs = Seq((1L, "ab a b"), (2L, "abab")).toDF("doc_id", "text")
    val counts = Unigram.tokenCounts(docs, pieces)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 3L, 2L -> 2L))
    val table = Unigram.piecesTable(spark, pieces)
    assert(table.columns.toSeq === Seq("piece", "log_prob"))
    assert(table.count() === 3)
  }

  test("sampled encode: chars preserved, count >= Viterbi, deterministic per seed") {
    val docs = fixtureDocs.limit(50)
      .select(graft.functions.TextFns.normalize(col("text")).as("norm"),
        Unigram.encodeSampled(col("text"), pinned, alpha = 0.5, seed = 7L).as("samp"),
        Unigram.encode(col("text"), pinned).as("vit"))
    docs.collect().foreach { r =>
      val norm = r.getString(0).replace(" ", "")
      assert(r.getSeq[String](1).mkString("") === norm,
        "sampled segmentation must rebuild the normalized text")
      // Viterbi is the piece-count MINIMUM under the pinned vocab (each
      // occurrence use saves one token, occurrences independent)
      assert(r.getSeq[String](1).size >= r.getSeq[String](2).size)
    }
    // pure content function: same seed -> same draw, every time
    def all(seed: Long) = fixtureDocs.limit(50)
      .select(Unigram.encodeSampled(col("text"), pinned, alpha = 0.0, seed = seed).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(all(7L) === all(7L))
    // a new seed is a new draw (alpha = 0: uniform over segmentations, so
    // 50 docs differing nowhere is astronomically unlikely)
    assert(all(7L) !== all(8L))
  }

  test("sampled encode follows the alpha-scaled lattice distribution") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = Seq("ab" -> -1.0, "a" -> -1.0, "b" -> -1.0)
    def draw(alpha: Double, seed: Long): Int =
      graft.functions.UnigramSampleExpr(Literal("x"), vocab, -10.0, alpha, seed)
        .encode(UTF8String.fromString("ab")).numElements()
    // alpha = 1: P(["ab"]) = p_ab / (p_ab + p_a p_b) = 1/(1+e^-1) ≈ 0.731
    val n1 = (1 to 400).count(s => draw(1.0, s.toLong) == 1)
    assert(n1 > 250 && n1 < 335, s"alpha=1 single-piece rate $n1/400, want ~292")
    // alpha = 0: uniform over the two segmentations ≈ 0.5
    val n0 = (1 to 400).count(s => draw(0.0, s.toLong) == 1)
    assert(n0 > 160 && n0 < 240, s"alpha=0 single-piece rate $n0/400, want ~200")
    // alpha large: sampling collapses onto Viterbi (choosing the worse
    // branch needs u within e^(-alpha*17), below the 53-bit draw resolution)
    (1 to 50).foreach(s => assert(draw(50.0, s.toLong) == 1))
  }

  test("trainVocab rejects invalid parameters") {
    intercept[IllegalArgumentException] { Unigram.trainVocab(fixtureDocs, vocabSize = 1) }
    intercept[IllegalArgumentException] {
      Unigram.trainVocab(fixtureDocs, pruneFrac = 1.0)
    }
  }
}
