package graft.ops

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization") in
  * the hard-EM variant: piece probabilities are re-estimated from VITERBI
  * best-segmentation counts instead of full forward-backward expectations,
  * which keeps every score an exact integer micro-nat (max/+ arithmetic —
  * no cross-engine float-sum hazard) and makes the whole training
  * recurrence replayable by a SQL oracle, the same determinism contract as
  * [[Bpe]].
  *
  * Division of labor at 100 TB (identical to [[Bpe]]): the corpus-wide
  * work — normalize, tokenize, count word occurrences — is ONE distributed
  * aggregation whose output is the distinct-word dictionary (vocabulary-
  * bounded, not corpus-bounded); seeding + EM then run on that dictionary
  * on the driver, and the learned (piece, log-prob) table folds back into
  * the plan as a driver literal inside the codegen'd
  * [[org.apache.spark.sql.graftx.UnigramEncode]] expression, so ENCODING —
  * the part that touches all 100 TB — is a zero-shuffle whole-stage-codegen
  * projection.
  *
  * Determinism contract (mirrored by the oracle):
  *  - seed vocabulary = every substring of length 1..`maxPieceLen` of the
  *    dictionary words (weighted by word count), capped to the top
  *    `vocabSize` by (count desc, piece asc), UNION all single characters
  *    (guaranteed character coverage — so the training DP never needs an
  *    OOV arc);
  *  - piece log-probs quantize to integer micro-nats via
  *    round(ln(count/total)·10⁶), HALF_UP away from zero (the repo-wide /
  *    DuckDB round() tie convention);
  *  - Viterbi ties break to the LARGER split point (the shorter last
  *    piece);
  *  - after each round, multi-char pieces with zero Viterbi count drop;
  *    single-char pieces persist with a count floor of 1 (character
  *    coverage, as SentencePiece's pruning protects characters);
  *  - words longer than `maxWordLen` are excluded from the TRAINING
  *    dictionary (rare tail; they still encode — the encoder handles any
  *    length and emits unseen characters as single-char OOV tokens under
  *    `oovPenalty`, so encoding is total and round-trips).
  */
object UnigramLm {

  /** round(ln(num/den)·10⁶) as a long — HALF_UP away from zero on the
    * shortest-decimal double, matching DuckDB `round()` and Spark
    * `round()` (the [[NaiveBayes]] convention).
    */
  def quantLn(num: Long, den: Long): Long =
    java.math.BigDecimal.valueOf(math.log(num.toDouble / den.toDouble) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  /** Viterbi best segmentation of `word` under integer micro-nat piece
    * log-probs. Arcs: every model piece of length ≤ `maxPieceLen` matching
    * a suffix of the prefix, plus a single-char OOV arc (scored
    * `oovPenalty`, emitting the char itself) for characters absent from
    * the model — so segmentation is total. Ties break to the higher
    * score, then the LARGER split point.
    */
  def viterbi(word: String, lp: collection.Map[String, Long],
      maxPieceLen: Int, oovPenalty: Long): List[String] = {
    val n = word.length
    if (n == 0) return Nil
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var bestScore = Long.MinValue
      var bestJ = -1
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Long.MinValue) {
          val piece = word.substring(j, i)
          val arc = lp.get(piece) match {
            case Some(l) => l
            case None => if (i - j == 1) oovPenalty else Long.MinValue
          }
          if (arc != Long.MinValue) {
            val sc = best(j) + arc
            if (sc > bestScore || (sc == bestScore && j > bestJ)) {
              bestScore = sc; bestJ = j
            }
          }
        }
        j += 1
      }
      best(i) = bestScore
      back(i) = bestJ
      i += 1
    }
    var out = List.empty[String]
    var p = n
    while (p > 0) {
      val j = back(p)
      out = word.substring(j, p) :: out
      p = j
    }
    out
  }

  /** Train on (word, count) pairs; returns the final vocabulary as
    * (piece, viterbiCount, logpMicroNats), unordered.
    */
  def train(counts: Seq[(String, Long)], vocabSize: Int,
      maxPieceLen: Int = 4, maxWordLen: Int = 16, emRounds: Int = 2,
      oovPenalty: Long = -30000000L): Seq[(String, Long, Long)] = {
    require(maxWordLen <= 31,
      "maxWordLen > 31 breaks the oracle's 5-bit split-point packing")
    val dict = counts.filter { case (w, _) =>
      w.nonEmpty && w.length <= maxWordLen
    }
    val cand = collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          cand(p) = cand.getOrElse(p, 0L) + c
          l += 1
        }
        i += 1
      }
    }
    val topV = cand.toSeq.sortBy { case (p, n) => (-n, p) }.take(vocabSize)
    var vocab: Map[String, Long] =
      (cand.iterator.filter(_._1.length == 1) ++ topV.iterator).toMap
    for (_ <- 1 to emRounds) {
      val total = vocab.valuesIterator.sum
      val lp = vocab.map { case (p, n) => p -> quantLn(n, total) }
      val nc = collection.mutable.HashMap.empty[String, Long]
      dict.foreach { case (w, c) =>
        viterbi(w, lp, maxPieceLen, oovPenalty).foreach { p =>
          // OOV arcs (piece outside the model) never count — with full
          // character seeding they cannot occur in training anyway
          if (vocab.contains(p)) nc(p) = nc.getOrElse(p, 0L) + c
        }
      }
      vocab = vocab.flatMap { case (p, _) =>
        val n = nc.getOrElse(p, 0L)
        if (p.length == 1) Some(p -> math.max(n, 1L))
        else if (n > 0) Some(p -> n)
        else None
      }
    }
    val total = vocab.valuesIterator.sum
    vocab.iterator
      .map { case (p, n) => (p, n, quantLn(n, total)) }
      .toSeq
  }
}
