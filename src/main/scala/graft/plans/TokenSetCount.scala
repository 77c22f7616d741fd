package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-set token counter: `array<string>` tokens →
  * `array<int>` where element i is the number of token OCCURRENCES that
  * belong to `sets(i)` — exactly
  * `size(filter(tokens, t => t.isin(set: _*)))` per set, the formula
  * the DuckDB oracle mirrors as `len(list_filter(...))`.
  *
  * Replaces one interpreted higher-order `filter` per language in the
  * language-ID path (SURVEY §2.B.11 preference order: custom Expression
  * beats HOF): ALL sets are counted in a single pass over the token
  * array via one UTF8String→bitmask hash probe per token, instead of
  * |sets| expression-tree walks per row. Membership is tested on the
  * raw UTF8String bytes — no per-token String materialization.
  */
case class TokenSetCount(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  require(sets.nonEmpty && sets.size <= 30, "1..30 sets (bitmask-encoded)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // token → bitmask of the sets containing it; built once per task via
  // the expression reference object, shared across rows
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    sets.zipWithIndex.foreach { case (set, i) =>
      set.foreach { t =>
        val k = UTF8String.fromString(t)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue) | (1 << i)))
      }
    }
    m
  }

  def compute(tokens: ArrayData): ArrayData = {
    val counts = new Array[Int](sets.size)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val mask = lookup.get(tokens.getUTF8String(i))
      if (mask != null) {
        var m = mask.intValue
        while (m != 0) {
          counts(Integer.numberOfTrailingZeros(m)) += 1
          m &= m - 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Reference-object call keeps the enclosing stage in whole-stage
    * codegen (the [[NGramMd5]] pattern). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSetCount", this, classOf[TokenSetCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_token_set_count"
}

object TokenSetCount {
  def apply(tokens: Column, sets: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenSetCount(GraftBridge.expression(tokens), sets))
}
