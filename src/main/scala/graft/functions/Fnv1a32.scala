package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Native Catalyst expression: 32-bit FNV-1a hash of a binary column —
  * the key hash kafka-go's `Hash`/`ReferenceHash` balancers use
  * (reference `config.go:42-49` selects them). Spark has no FNV builtin,
  * and client-side partition placement (`partition = f(key) % n`) must
  * reproduce the producer's hash bit-for-bit or keys migrate partitions
  * on the switchover; a codegen'd expression keeps the computation in
  * the sink projection's whole-stage codegen.
  */
case class Fnv1a32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "fnv1a32"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Fnv1a32.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a32 =
    copy(child = newChild)
}

object Fnv1a32 {
  /** FNV-1a, 32-bit: offset basis 2166136261, prime 16777619. */
  def hash(bytes: Array[Byte]): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xff)) * 0x01000193
      i += 1
    }
    h
  }

  val info = new ExpressionInfo(classOf[Fnv1a32].getName, "fnv1a32")
}
