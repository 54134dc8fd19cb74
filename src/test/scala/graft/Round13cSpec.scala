package graft

import org.apache.spark.sql.functions._
import graft.queries.{Bpe, NorthStar, Q64hUnigramVocab, Q64iUnigramEncode}

/** Round 13: the Unigram-LM tokenizer (q64h train, q64i encode) —
  * hard-EM over a substring-seeded inventory with integer-quantized
  * log-prob scores. The oracle replays training relationally; these
  * tests pin the properties the hash gate can't see: EM improvement,
  * the DP against a brute-force reference, the oracle's unroll-depth
  * contract, and coverage (no [UNK] arm by construction). */
class Round13cSpec extends SparkSpec {

  test("q64h: hard-EM corpus Viterbi score improves and converges (round r >= round 1)") {
    val (_, roundScores, _) = Q64hUnigramVocab.learn(spark, sf)
    assert(roundScores.length == Q64hUnigramVocab.EmRounds)
    // Round 1 scores the SEED inventory (substring counts); later
    // rounds score EM-refit counts. Every refit round must beat (or
    // match) the seed model — the Viterbi-EM improvement guarantee,
    // modulo the documented 1e-6 quantization.
    roundScores.tail.foreach { s =>
      assert(s >= roundScores.head,
        s"EM degraded the corpus score: $roundScores")
    }
    // And the trajectory must converge, not oscillate: the last two
    // rounds agree to within the quantization noise floor.
    val Seq(a, b) = roundScores.takeRight(2)
    assert(math.abs(b - a).toDouble <=
        math.max(1e-4 * math.abs(a).toDouble, 1000.0),
      s"EM not converged after ${Q64hUnigramVocab.EmRounds} rounds: $roundScores")
  }

  test("q64i: the DP equals brute-force max-likelihood segmentation on every corpus word") {
    val (inventory, _, words) = Q64hUnigramVocab.learn(spark, sf)
    val scores = Q64hUnigramVocab.scoresOf(inventory).toMap
    // Spark-side per-word encodings through the SAME expr q64i's
    // dictionary uses.
    val got = words.select(col("word"),
        expr(NorthStar.let("w_", "word",
          Q64hUnigramVocab.viterbiExpr(Q64hUnigramVocab.scoresOf(inventory))))
          .as("enc"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // Brute-force reference: enumerate ALL segmentations (pieces ≤
    // MaxPiece), pick max by (score, fewer pieces, enc desc) — the
    // pinned total order.
    def segs(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(Q64hUnigramVocab.MaxPiece, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (!scores.contains(p)) Nil
        else segs(w.substring(l)).map(p :: _)
      }
    var checked = 0
    got.keys.toSeq.sorted.take(300).foreach { w =>
      // (sf0.001 has ~31 distinct normalized words — all checked)
      val best = segs(w).map { ps =>
        (ps.map(scores).sum, -ps.length, ps.mkString(" "))
      }.max
      assert(got(w) == best._3,
        s"DP diverged on '$w': got '${got(w)}', brute force '${best._3}'")
      checked += 1
    }
    assert(checked >= 25, s"fixture too small: only $checked words checked")
  }

  test("q64h/q64i: oracle unroll depth covers the corpus at both scales; chars are never pruned") {
    for (dir <- Seq(sf, sf01)) {
      val maxLen = Bpe.wordFreq(spark, dir)
        .agg(max(length(col("word")))).head().getInt(0)
      assert(maxLen <= Q64hUnigramVocab.OracleSteps,
        s"$dir: max normalized word $maxLen exceeds the oracle's " +
          s"${Q64hUnigramVocab.OracleSteps}-step Viterbi unroll")
    }
    val (inventory, _, words) = Q64hUnigramVocab.learn(spark, sf)
    val invChars = inventory.filter(_._1.length == 1).map(_._1).toSet
    val corpusChars = words.select(explode(expr(
        "transform(sequence(1, length(word)), i_ -> substring(word, i_, 1))"))
        .as("ch")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(corpusChars.subsetOf(invChars),
      s"coverage hole: ${corpusChars -- invChars} pruned from the inventory")
  }

  test("q64i: encode coverage is total — no doc with words but zero pieces, fertility >= 1") {
    val out = Q64iUnigramEncode.run(spark, sf).collect()
    out.foreach { r =>
      val (nw, np) = (r.getLong(1), r.getLong(2))
      assert(np >= nw, s"doc ${r.getLong(0)}: $np pieces < $nw words")
      if (nw == 0) assert(r.getString(3) == "")
    }
    assert(out.exists(_.getLong(1) > 0))
  }
}
