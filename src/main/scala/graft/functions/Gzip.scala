package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GZIP compress/decompress kernels — REAL codecs (java.util.zip is in
  * the base JDK, unlike the image/audio libraries behind
  * `multimodal.StubCodec`), closing the compressed-TEXT half of the
  * compressed-formats gap: CommonCrawl-style ingestion meets gzip
  * constantly (`Content-Encoding: gzip` response payloads, `.gz` shard
  * files), and a curation pipeline wants to decode it as a map stage,
  * not a preprocessing detour.
  *
  * Decompression is INGESTION-GRADE fail-soft: malformed or truncated
  * streams yield NULL (the `JsonLines` corrupt-line quarantine
  * precedent — one bad record must not kill a 100 TB job), and output
  * is capped at `maxBytes` as a zip-bomb guard (a 10 KB bomb can
  * inflate to GBs; past the cap the row goes NULL rather than OOMing
  * the executor). Both kernels are codegen'd scalar expressions —
  * payload bytes never leave the task that read them.
  */
object Gzip {

  /** GZIP bytes of a string or binary column. Deterministic for a given
    * input WITHIN one JDK (fixed deflate level, no timestamps in the
    * header as written by `GZIPOutputStream`) — but deflate byte streams
    * are NOT a cross-engine/cross-implementation contract, so only the
    * decompress(compress(x)) == x roundtrip belongs in an oracle hash
    * (q93 pins exactly that), never the compressed bytes themselves.
    */
  def gzip(c: Column): Column = toCol(GzipCompressExpr(toExpr(c)))

  /** Decompressed bytes of a GZIP binary column; NULL on malformed or
    * truncated input or when the output would exceed `maxBytes`.
    */
  def gunzip(c: Column, maxBytes: Int = 64 * 1024 * 1024): Column =
    toCol(GzipDecompressExpr(toExpr(c), maxBytes))

  /** Decompressed TEXT of a GZIP binary column (UTF-8 bytes to string —
    * Spark's binary-to-string cast is exactly `UTF8String.fromBytes`).
    */
  def gunzipText(c: Column, maxBytes: Int = 64 * 1024 * 1024): Column =
    gunzip(c, maxBytes).cast("string")

  /** Kernel: compress. Called from generated code. */
  def compress(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(math.max(64, bytes.length / 2))
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  /** Kernel: compress a string cell's UTF-8 bytes. */
  def compressStr(s: UTF8String): Array[Byte] = compress(s.getBytes)

  /** Kernel: decompress with quarantine semantics — null on malformed /
    * truncated / over-budget streams, never an exception. The stream is
    * closed on EVERY exit path (try/finally): GZIPInputStream owns a
    * native Inflater, and leaving it to finalization on the zip-bomb /
    * malformed paths churns native memory in a hot codegen loop over
    * many bad rows.
    */
  def decompress(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    var in: GZIPInputStream = null
    try {
      in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(math.min(math.max(64, bytes.length * 3), maxBytes))
      val buf = new Array[Byte](8192)
      var total = 0
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        if (total > maxBytes) return null // zip-bomb guard
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch {
      case _: java.io.IOException => null // malformed or truncated stream
    } finally {
      if (in != null) {
        try in.close() // ends the Inflater, freeing native buffers now
        catch { case _: java.io.IOException => () }
      }
    }
  }
}

/** Catalyst expression behind [[Gzip.gzip]]: string or binary in, GZIP
  * binary out.
  */
case class GzipCompressExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary column, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip"
  @transient private lazy val isBinary = child.dataType == BinaryType
  override protected def nullSafeEval(input: Any): Any =
    if (isBinary) Gzip.compress(input.asInstanceOf[Array[Byte]])
    else Gzip.compressStr(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isBinary) defineCodeGen(ctx, ev, c => s"graft.functions.Gzip.compress($c)")
    else defineCodeGen(ctx, ev, c => s"graft.functions.Gzip.compressStr($c)")
  override protected def withNewChildInternal(newChild: Expression): GzipCompressExpr =
    copy(child = newChild)
}

/** Catalyst expression behind [[Gzip.gunzip]]: GZIP binary in, bytes
  * out; NULL on malformed/truncated/over-budget input (fail-soft
  * ingestion quarantine + zip-bomb guard).
  */
case class GzipDecompressExpr(child: Expression, maxBytes: Int)
    extends UnaryExpression {
  require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary column, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip"
  override protected def nullSafeEval(input: Any): Any =
    Gzip.decompress(input.asInstanceOf[Array[Byte]], maxBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Gzip.decompress($c, $maxBytes);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): GzipDecompressExpr =
    copy(child = newChild)
}
