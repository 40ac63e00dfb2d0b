package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

/** Byte-pair-encoding tokenizer TRAINING at corpus scale (Sennrich et al.
  * 2016) — the vocabulary-learning step every LLM data pipeline runs
  * before token counting, packing or budget selection can be meaningful.
  *
  * The Spark-first shape is the one every production trainer
  * (sentencepiece, HF tokenizers) uses: BPE training is a pure function
  * of the WORD-FREQUENCY table, not the corpus — so the only distributed
  * work is ONE map-side-combined `groupBy(word).count` (plus an optional
  * top-`maxVocabWords` cap, a `TakeOrderedAndProject`), and the merge
  * loop runs on the driver over that bounded table. 100 TB of text
  * becomes a few million (word, count) rows before the loop starts; the
  * driver never sees a document.
  *
  * Determinism contract (what makes the result reproducible across
  * partitionings and engines): the merge chosen each round is the
  * max-count pair with `(left, right)` LEXICOGRAPHIC tie-break, and the
  * word table is capped by `(count DESC, word ASC)` — both total orders.
  *
  * Application ([[encode]]) is the standard greedy lowest-rank merging,
  * compiled ([[graft.functions.BpeEncodeExpr]]) — a zero-shuffle map
  * stage; `encode(train(corpus), corpus)` is how q30-style token budgets
  * would be computed under a LEARNED vocabulary instead of the regex
  * heuristic.
  *
  * Reference surface parity note: the reference engine has no tokenizer
  * surface; this is part of the beyond-the-reference LLM-pipeline
  * mandate (SURVEY §2.13).
  */
object Bpe {

  /** Learn `numMerges` merge rules from the corpus. Words are the
    * engine-wide `\s+`-run convention; symbols start as code points.
    * `minCount` drops hapax noise before the cap; `maxVocabWords` bounds
    * the driver table (the ONLY collect in the operator — capped by
    * construction).
    */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minCount: Long = 1L,
      maxVocabWords: Int = 1000000): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxVocabWords > 0, s"maxVocabWords must be positive, got $maxVocabWords")
    val words = df
      .select(explode(filter(split(col(textCol), "\\s+"), w => w =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainOnWordCounts(words, numMerges)
  }

  /** The driver merge loop, exposed for spec-level verification against
    * hand-computed goldens. `words` is (word, frequency).
    */
  def trainOnWordCounts(
      words: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    // symbol sequences as mutable buffers; counts parallel array
    val syms = words.map { case (w, _) =>
      val b = new scala.collection.mutable.ArrayBuffer[String](w.length)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b
    }
    val counts = words.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // weighted adjacent-pair counts over the whole vocabulary
      val pair = new java.util.HashMap[(String, String), Long]()
      var w = 0
      while (w < syms.length) {
        val s = syms(w)
        val c = counts(w)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          val prev = pair.get(k)
          pair.put(k, (if (prev == null) 0L else prev.longValue) + c)
          i += 1
        }
        w += 1
      }
      if (pair.isEmpty) exhausted = true
      else {
        // argmax with (count DESC, left ASC, right ASC); string order is
        // CODE-POINT order (== UTF-8 byte order), not UTF-16 code units,
        // so any engine's binary collation replays the same tie-break
        var best: (String, String) = null
        var bestC = -1L
        val it = pair.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val k = e.getKey
          val c = e.getValue.longValue
          if (c > bestC || (c == bestC && {
            val l = cmpCodePoints(k._1, best._1)
            l < 0 || (l == 0 && cmpCodePoints(k._2, best._2) < 0)
          })) {
            best = k
            bestC = c
          }
        }
        merges += best
        // merge every occurrence in every word containing the pair
        w = 0
        while (w < syms.length) {
          val s = syms(w)
          var i = 0
          while (i < s.length - 1) {
            if (s(i) == best._1 && s(i + 1) == best._2) {
              s(i) = best._1 + best._2
              s.remove(i + 1)
            }
            i += 1
          }
          w += 1
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Code-point-order string comparison (== UTF-8 binary collation). */
  private def cmpCodePoints(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** BPE token array of the text under the trained merges (compiled,
    * zero shuffle).
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    toCol(graft.functions.BpeEncodeExpr(toExpr(text), merges))

  /** Token count under the learned vocabulary. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))

  /** The merges as a (rank, left, right) DataFrame — the persistable
    * vocabulary artifact.
    */
  def mergesTable(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
  }
}
