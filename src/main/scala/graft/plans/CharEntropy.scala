package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution Shannon entropy (bits per character) — the
  * direct form of the low-entropy-junk signal [[DeflateSize]] proxies:
  * keyword stuffing, character floods, and templated boilerplate sit
  * far below natural text (~4 bits/char for English), while
  * base64/hex blobs sit above it. One compiled map-only pass per row;
  * the count table is per-row-local (alphabet-sized), so the operator
  * never shuffles — at 100 TB this is a scan, not an explode into
  * per-character rows.
  *
  * Determinism: counts are exact integers over UNICODE CODE POINTS,
  * and the float sum Σ k·log2(k) folds in ASCENDING code-point order
  * — a defined order the DuckDB twin replays with
  * `list_reduce(list(term ORDER BY c), +)` (UTF-8 binary collation ≡
  * code-point order). H = log2(n) − Σ/n, so the only
  * platform-sensitive ops are log2 and the ordered sum; the declared
  * query rounds to 6dp (the Qh continuous-value bridge — drift is
  * ~1e-13 against a 5e-7 boundary). Empty text → 0.0. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  private val ln2 = Math.log(2.0)

  def compute(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Int, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator() // TreeMap: ascending code point
    while (it.hasNext) {
      val k = it.next().toDouble
      acc += k * (Math.log(k) / ln2)
    }
    Math.log(n.toDouble) / ln2 - acc / n
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_char_entropy"
}

object CharEntropy {
  def apply(text: Column): Column =
    GraftBridge.column(CharEntropy(GraftBridge.expression(text)))
}
