package graft.sketch

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a native Catalyst aggregate — the
  * bounded-memory "top tokens / top URLs / top domains per group" primitive
  * for streams whose key cardinality explodes past what a hash aggregate
  * can hold. A plain `groupBy(term).count` over 100 TB of tokens carries
  * the FULL vocabulary through the exchange (billions of keys for web
  * text); the SpaceSaving summary caps every partial buffer at `capacity`
  * entries, so the shuffle ships `capacity * partitions * groups` rows no
  * matter how many distinct keys the stream holds.
  *
  * Algorithm (Metwally/Agrawal/El Abbadi 2005 "Efficient computation of
  * frequent and top-k elements in data streams"): keep at most `capacity`
  * (term, count, err) entries; a hit increments its entry; a miss over
  * capacity evicts the minimum-count entry `m` and inherits its count
  * (count = m.count + 1, err = m.count). Invariant: for every tracked
  * term, `true <= count` and `count - err <= true`; for every untracked
  * term, `true <= min-count(summary)`.
  *
  * Merge (Agarwal et al. 2012 "Mergeable summaries"): for each term in
  * either summary, the side missing it contributes its min-count bound to
  * BOTH count and err (0 when that side never filled — its absence then
  * proves count 0); keep the `capacity` largest. This preserves the
  * invariant under Spark's arbitrary partial-merge order, with one honest
  * caveat the scaladoc states rather than hides: once evictions happen,
  * WHICH near-minimum tail entries survive can depend on merge order
  * (their count/err bounds remain valid either way). While no buffer ever
  * fills — capacity above the group's distinct-key count, the regime the
  * oracle checks — every count is exact (err 0) and the output is fully
  * deterministic.
  *
  * Input is a string column (one key per row) or array<string> (all
  * elements added — per-document token ARRAYS feed the sketch without an
  * explode, so no corpus-token stream ever exists in the plan).
  * Output: array<struct<term, count, err>> sorted by (count desc, term
  * asc), at most `capacity` entries; [[SpaceSaving.topK]] slices the head.
  *
  * Reference surface parity note: the reference engine has no sketch
  * surface; this is part of the beyond-the-reference LLM-pipeline mandate
  * (SURVEY §2.13).
  */
object SpaceSaving {

  /** Sketch aggregate over a string key column or array<string> of keys. */
  def summary(keys: Column, capacity: Int): Column =
    toCol(SpaceSavingAgg(toExpr(keys), capacity).toAggregateExpression())

  /** Head of a summary: the k entries with the largest counts (the
    * summary is already (count desc, term asc)-sorted).
    */
  def topK(summary: Column, k: Int): Column = slice(summary, 1, k)
}

/** Bounded counter table: term -> (count, err) with min-eviction. Kept as
  * a plain HashMap + full scan for the minimum on eviction: eviction only
  * happens past `capacity` distinct keys, and correctness (not eviction
  * micro-cost) dominates here; a heap-backed variant is a drop-in if a
  * profile ever demands it.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  private[sketch] val map = new java.util.HashMap[String, Array[Long]]()
  private[sketch] var filled: Boolean = false

  /** Min count over tracked entries; the bound on any UNtracked term's
    * true count. 0 while the buffer has never filled (absence then proves
    * count 0).
    */
  def minBound: Long =
    if (!filled) 0L
    else {
      var m = Long.MaxValue
      val it = map.values().iterator()
      while (it.hasNext) { val v = it.next(); if (v(0) < m) m = v(0) }
      if (m == Long.MaxValue) 0L else m
    }

  def add(term: String, by: Long = 1L, err: Long = 0L): Unit = {
    val cur = map.get(term)
    if (cur != null) { cur(0) += by; cur(1) += err }
    else if (map.size < capacity) { map.put(term, Array(by, err)); () }
    else {
      filled = true
      // evict the deterministic minimum: (count, err desc, term) — among
      // equal counts prefer to keep the LOW-err (better-attested) entry
      var mk: String = null
      var mc = Long.MaxValue
      var me = -1L
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0); val er = e.getValue()(1)
        if (c < mc || (c == mc && (er > me || (er == me && (mk == null || e.getKey < mk))))) {
          mk = e.getKey; mc = c; me = er
        }
      }
      map.remove(mk)
      map.put(term, Array(mc + by, mc + err))
      ()
    }
  }

  def mergeIn(o: SpaceSavingBuffer): Unit = {
    val mSelf = minBound
    val mOther = o.minBound
    // terms only in `this` absorb the other side's min bound
    if (mOther > 0L) {
      val it = map.values().iterator()
      while (it.hasNext) { val v = it.next(); v(0) += mOther; v(1) += mOther }
    }
    val it = o.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = map.get(e.getKey)
      if (cur != null) {
        // already bumped by mOther above; undo that double count for
        // terms present on BOTH sides, then add the real contribution
        cur(0) += e.getValue()(0) - mOther; cur(1) += e.getValue()(1) - mOther
      } else {
        map.put(e.getKey, Array(e.getValue()(0) + mSelf, e.getValue()(1) + mSelf))
      }
    }
    if (o.filled) filled = true
    if (map.size > capacity) {
      filled = true
      val kept = sortedEntries.take(capacity)
      map.clear()
      kept.foreach { case (t, c, er) => map.put(t, Array(c, er)) }
    }
  }

  /** (count desc, term asc)-sorted entries. */
  def sortedEntries: Array[(String, Long, Long)] = {
    val out = new Array[(String, Long, Long)](map.size)
    val it = map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = (e.getKey, e.getValue()(0), e.getValue()(1)); i += 1
    }
    java.util.Arrays.sort(out, new java.util.Comparator[(String, Long, Long)] {
      override def compare(a: (String, Long, Long), b: (String, Long, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    out
  }
}

/** The Catalyst aggregate behind [[SpaceSaving.summary]]. */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  @transient private lazy val arrayInput: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or array<string> column, got $t")
  }

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) {
      if (arrayInput) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i)) buffer.add(arr.getUTF8String(i).toString)
          i += 1
        }
      } else buffer.add(v.asInstanceOf[UTF8String].toString)
    }
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, input: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.mergeIn(input)
    buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any = {
    val entries = buffer.sortedEntries
    new GenericArrayData(entries.map { case (t, c, e) =>
      InternalRow(UTF8String.fromString(t), c, e)
    }.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    val entries = buffer.sortedEntries
    val byteArrs = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 5 + byteArrs.map(_.length + 20).sum
    val bb = ByteBuffer.allocate(size)
    bb.put(if (buffer.filled) 1.toByte else 0.toByte)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(byteArrs(i).length)
      bb.put(byteArrs(i))
      bb.putLong(entries(i)._2)
      bb.putLong(entries(i)._3)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SpaceSavingBuffer(capacity)
    buf.filled = bb.get() == 1.toByte
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val strBytes = new Array[Byte](len)
      bb.get(strBytes)
      val c = bb.getLong
      val e = bb.getLong
      buf.map.put(new String(strBytes, StandardCharsets.UTF_8), Array(c, e))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "space_saving"
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
}
