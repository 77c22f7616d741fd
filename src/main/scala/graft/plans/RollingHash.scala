package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Karp-Rabin rolling hash: fold `(acc * 31 + codepoint) % mod`
  * over the string's characters, seed 0 — EXACTLY the interpreted
  * `aggregate(transform(sequence(1, length(s)), i => ascii(substr(s,i,1))),
  * 0L, (a,x) => (a*31+x) % mod)` chain it replaces (one interpreted
  * expression-tree walk PER CHARACTER), and the formula the DuckDB
  * oracle replicates with list_reduce. Iterates codepoints (Spark's
  * `ascii`/`substr` are character-based, not byte-based), so non-ASCII
  * text folds identically too.
  */
case class RollingHash(child: Expression, mod: Long) extends UnaryExpression {

  require(mod > 0, "modulus must be positive")

  override def dataType: DataType = LongType

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Reference-object call keeps the stage in whole-stage codegen (the
    * [[NGramMd5]] pattern). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingHash", this, classOf[RollingHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_rolling_hash"
}

object RollingHash {
  def apply(text: Column, mod: Long): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(text), mod))
}
