package graft.functions

/** Reference-object tables for the SentencePiece unigram-LM encoder
  * ([[TextAlgo.spEncodePieces]]): piece -> log-prob lookup, the max
  * piece length in UTF-16 units (bounds the Viterbi inner loop), and
  * the char-fallback penalty for codepoints outside the vocabulary.
  * Ships with the plan as ONE codegen reference object (the
  * [[ByteBpeTables]] convention).
  */
final class SpTables(
    val pieces: Array[String],
    val logProbs: Array[Double],
    val fallbackLogProb: Double) extends Serializable {
  require(pieces.length == logProbs.length, "pieces and logProbs must align")

  @transient lazy val lookup: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), logProbs(i)); i += 1 }
    m
  }

  @transient lazy val maxPieceChars: Int = {
    var mx = 1
    var i = 0
    while (i < pieces.length) {
      if (pieces(i).length > mx) mx = pieces(i).length
      i += 1
    }
    mx
  }
}
