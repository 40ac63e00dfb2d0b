package graft.similarity

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._

/** Element-wise vector pooling as a native Catalyst aggregate — the group
  * centroid / feature-pool primitive of an embedding pipeline: mean-pool
  * chunk embeddings back into a document vector, centroid per cluster /
  * label / source, max-pool feature detectors.
  *
  * Why an aggregate and not `posexplode` + `groupBy(key, pos)` +
  * `collect_list`: the explode ships n_rows x dim scalar rows through the
  * exchange and then needs an order-sensitive re-assembly; this buffer
  * ships ONE dim-length double array per (group x map-partition) — the
  * classic map-side-combine shape that stays flat as rows-per-group grows,
  * which is what a 100 TB corpus of chunk embeddings needs. The buffer is
  * mergeable (element-wise), so partial aggregation and AQE re-plans are
  * free, and it serializes into a streaming state store like any
  * TypedImperativeAggregate.
  *
  * Semantics:
  *  - input: `array<float>` or `array<double>`; NULL rows are skipped;
  *    a row whose array CONTAINS a null element is skipped whole (a
  *    partial vector has no well-defined element-wise contribution);
  *  - all participating vectors must share one dimension — a mismatch
  *    fails fast with the offending sizes (silent zero-padding would
  *    corrupt centroids);
  *  - empty group (or all-NULL) -> NULL result, mirroring built-in aggs;
  *  - `max`/`min` are exactly order-independent; `sum`/`mean` are exact
  *    up to floating addition order (bit-identical when the inputs are
  *    integral-valued, e.g. quantized vectors — the q83 oracle exploits
  *    this; on raw floats the noise is ULP-scale);
  *  - NaN follows Spark's sort semantics (NaN is greater than any
  *    non-NaN): `max` of a dim containing NaN is NaN, `min` is NaN only
  *    when every value in that dim is NaN; `sum`/`mean` propagate NaN
  *    like plain double addition.
  *
  * Reference surface parity note: the reference engine (pandas fairness
  * library) has no vector surface; this is part of the
  * beyond-the-reference LLM-pipeline mandate (SURVEY §2.13).
  */
object Pooling {

  /** Element-wise sum over the group. */
  def sumPool(vec: Column): Column = agg(vec, VecPoolAgg.Sum)

  /** Element-wise mean over the group (sum / non-skipped row count). */
  def meanPool(vec: Column): Column = agg(vec, VecPoolAgg.Mean)

  /** Element-wise max over the group. */
  def maxPool(vec: Column): Column = agg(vec, VecPoolAgg.Max)

  /** Element-wise min over the group. */
  def minPool(vec: Column): Column = agg(vec, VecPoolAgg.Min)

  private def agg(vec: Column, mode: Int): Column =
    toCol(VecPoolAgg(toExpr(vec), mode).toAggregateExpression())
}

/** Mutable pooling buffer: lazily sized from (a copy of) the first
  * vector — no ±Infinity init sentinels can ever leak into a result —
  * and combined element-wise after that; `n` counts the vectors folded
  * in (the mean denominator).
  */
final class VecPoolBuffer(val mode: Int) {
  private[similarity] var acc: Array[Double] = null
  private[similarity] var n: Long = 0L

  /** Claims `values` (ownership transfers — callers pass a fresh array). */
  def add(values: Array[Double]): Unit = {
    if (acc == null) acc = values
    else {
      val dim = values.length
      require(acc.length == dim,
        s"vec_pool: dimension mismatch — group has dim ${acc.length}, row has dim $dim")
      var i = 0
      (mode: @annotation.switch) match {
        case VecPoolAgg.Max =>
          // Math.max: NaN wins — Spark's "NaN greater than any non-NaN"
          while (i < dim) { acc(i) = math.max(acc(i), values(i)); i += 1 }
        case VecPoolAgg.Min =>
          // NaN loses to any real value; stays only if every value is NaN
          while (i < dim) {
            val v = values(i)
            if (v < acc(i) || acc(i).isNaN) acc(i) = v
            i += 1
          }
        case _ =>
          while (i < dim) { acc(i) += values(i); i += 1 }
      }
    }
    n += 1
  }

  def mergeIn(o: VecPoolBuffer): Unit = {
    if (o.acc != null) {
      add(o.acc) // merge combine == row combine for all four modes
      n += o.n - 1 // add() counted the merged buffer as one vector
    }
  }
}

/** The Catalyst aggregate behind [[Pooling]]: element-wise pool of an
  * `array<float>` / `array<double>` column into `array<double>`.
  */
case class VecPoolAgg(
    child: Expression,
    mode: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecPoolBuffer] with UnaryLike[Expression] {

  require(mode >= VecPoolAgg.Sum && mode <= VecPoolAgg.Min,
    s"unknown pooling mode $mode")

  // lazy: the child is unresolved (no dataType) while the analyzer copies
  // this node during resolution
  @transient private lazy val floatInput: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> column, got $t")
  }

  override def createAggregationBuffer(): VecPoolBuffer = new VecPoolBuffer(mode)

  override def update(buffer: VecPoolBuffer, input: InternalRow): VecPoolBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val dim = arr.numElements()
      // one direct pass: copy out + null-element detection, no closures
      val values = new Array[Double](dim)
      var anyNull = false
      var i = 0
      if (floatInput) {
        while (i < dim && !anyNull) {
          if (arr.isNullAt(i)) anyNull = true
          else { values(i) = arr.getFloat(i).toDouble; i += 1 }
        }
      } else {
        while (i < dim && !anyNull) {
          if (arr.isNullAt(i)) anyNull = true
          else { values(i) = arr.getDouble(i); i += 1 }
        }
      }
      if (!anyNull) buffer.add(values)
    }
    buffer
  }

  override def merge(buffer: VecPoolBuffer, input: VecPoolBuffer): VecPoolBuffer = {
    buffer.mergeIn(input)
    buffer
  }

  override def eval(buffer: VecPoolBuffer): Any = {
    if (buffer.acc == null) null
    else if (mode == VecPoolAgg.Mean) {
      val out = new Array[Double](buffer.acc.length)
      var i = 0
      while (i < out.length) { out(i) = buffer.acc(i) / buffer.n; i += 1 }
      new GenericArrayData(out)
    } else new GenericArrayData(buffer.acc.clone())
  }

  override def serialize(buffer: VecPoolBuffer): Array[Byte] = {
    val dim = if (buffer.acc == null) -1 else buffer.acc.length
    val bb = ByteBuffer.allocate(12 + 8 * math.max(dim, 0))
    bb.putLong(buffer.n)
    bb.putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buffer.acc(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecPoolBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecPoolBuffer(mode)
    buf.n = bb.getLong
    val dim = bb.getInt
    if (dim >= 0) {
      buf.acc = new Array[Double](dim)
      var i = 0
      while (i < dim) { buf.acc(i) = bb.getDouble; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecPoolAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecPoolAgg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_pool"
  override protected def withNewChildInternal(newChild: Expression): VecPoolAgg =
    copy(child = newChild)
}

object VecPoolAgg {
  final val Sum = 0
  final val Mean = 1
  final val Max = 2
  final val Min = 3

  /** Mode id from its SQL-surface name. */
  def modeOf(name: String): Int = name.toLowerCase(java.util.Locale.ROOT) match {
    case "sum" => Sum
    case "mean" | "avg" => Mean
    case "max" => Max
    case "min" => Min
    case other => throw new IllegalArgumentException(
      s"vec_pool mode must be sum|mean|max|min, got '$other'")
  }
}
