package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (the public sketch built by
  * `df.stat.bloomFilter`). The filter travels with the serialized plan and
  * is bound into generated code via `addReferenceObj`, so the probe is one
  * virtual call per row inside whole-stage codegen — no UDF boundary.
  *
  * Key hashing matches the builder: integral keys probe `mightContainLong`
  * (the builder's `putLong`); string keys probe `mightContainBinary` over
  * the UTF-8 bytes, which is byte-identical to the builder's `putString`
  * without materializing a `java.lang.String` per row.
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral or string column, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case _ => bloom.mightContainLong(input.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary(($c).getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long)($c))")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
