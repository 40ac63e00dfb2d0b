package graft.functions

/** The byte-level BPE lookup tables as ONE codegen reference object
  * (merge ranks, token-string -> id vocab, special-token strings + ids)
  * — built once on the driver from a [[graft.text.ByteBpe.Model]] and
  * shipped with the plan; see [[TextAlgo.byteBpeEncodeIds]].
  */
final class ByteBpeTables(
    merges: Seq[(String, String)],
    vocabEntries: Seq[(String, Int)],
    val specials: Array[String],
    val specialIds: Array[Long]) extends Serializable {
  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + " " + r, i) }
    m
  }
  @transient lazy val vocab: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocabEntries.size * 2)
    vocabEntries.foreach { case (t, i) => m.put(t, i) }
    m
  }
}
