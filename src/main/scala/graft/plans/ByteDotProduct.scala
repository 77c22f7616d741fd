package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst dot product over two `array<tinyint>` columns — the
  * integer sibling of [[DotProduct]], scoring kernel of the int8
  * quantized similarity path ([[graft.llmops.Similarity.quantizedTopK]]).
  * Accumulation is exact 32-bit integer arithmetic (|code| ≤ 127 →
  * |dot| ≤ dims·16129, far inside int for any realistic embedding
  * width), so there is no IEEE-ordering caveat at all: every
  * evaluation order gives the same value, and the SQL oracle's
  * `list_dot_product` over INTEGER lists matches exactly.
  * Same semantics pinning as [[DotProduct]]: common-prefix length,
  * null element → null result.
  */
case class ByteDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case org.apache.spark.sql.types.ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullable: Boolean = super.nullable || elemNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toInt * y.getByte(i).toInt
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck = if (elemNullable)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        int $acc = 0;
        for (int $i = 0; $i < $n; $i++) {
          $nullCheck
          $acc += (int) $a.getByte($i) * (int) $b.getByte($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bdot"
}

object ByteDotProduct {
  /** Column-level API: `dot(a, b)` over array<tinyint> codes. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      ByteDotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
