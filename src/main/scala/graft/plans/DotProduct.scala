package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns — the
  * codegen'd kernel for the similarity-search operators (SURVEY §7
  * "custom Catalyst work" candidate; preference order (b): a custom
  * `Expression` beats a UDF and beats the interpreted higher-order
  * `aggregate(zip_with(…))` fold, which falls out of whole-stage
  * codegen).
  *
  * Semantics are pinned to the HOF fold it replaces (and to the DuckDB
  * oracle's `list_dot_product` over `DOUBLE[]`): strict left-to-right
  * IEEE-754 double accumulation over the common prefix of the two
  * arrays — bit-identical results, ~an order of magnitude less
  * per-element overhead.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are array<double> by construction (callers cast); a dedicated
  // ExpectsInputTypes check is unavailable outside the sql package
  override def dataType: DataType = DoubleType

  // a null ELEMENT nulls the whole product, matching the HOF fold
  // (acc + null = null) and the oracle — so the result is nullable
  // whenever the element type is
  private def elemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case org.apache.spark.sql.types.ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullable: Boolean = super.nullable || elemNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
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
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $nullCheck
          $acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {
  /** Column-level API: `dot(a, b)` over array<double> (cast first). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a.cast("array<double>")),
        GraftBridge.expression(b.cast("array<double>"))))
}
