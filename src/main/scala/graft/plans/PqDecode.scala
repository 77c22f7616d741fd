package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native product-quantization DECODE kernel — the reconstruction half
  * of ADC scoring: per subspace, the codeword the stored 0-based code
  * names, concatenated back to one `array<double>` in subspace order.
  * The codebooks ride inside the expression as a reference object (the
  * [[PqEncode]] doctrine).
  *
  * Replaces the `flatten(array(element_at(typedlit(book_mi), code+1)…))`
  * column formulation — VALUE-identical (the kernel copies the same
  * literal doubles; no arithmetic), but the plan no longer carries
  * m × nCodes × dsub doubles as Literal nodes: at the m=8 × nCodes=256
  * rung those literals made every plan comparison the driver performs
  * (AQE re-optimization, canonicalization) walk ~16k-element arrays,
  * and the DRIVER side dominated the query's wall (r18 QProbe:
  * 1.93 s wall vs 0.6 s task time per warm execution). */
case class PqDecode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  @transient private lazy val outLen: Int = bookArr.map(_(0).length).sum

  def compute(input: ArrayData): ArrayData = {
    val m = bookArr.length
    require(input.numElements() == m,
      s"PqDecode: expected $m codes, got ${input.numElements()}")
    val out = new Array[Double](outLen)
    var off = 0
    var mi = 0
    while (mi < m) {
      val c = bookArr(mi)(input.getInt(mi)) // in-range by construction
      System.arraycopy(c, 0, out, off, c.length)
      off += c.length
      mi += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDecode", this, classOf[PqDecode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_decode"
}

object PqDecode {
  def apply(codes: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqDecode(GraftBridge.expression(codes), books))
}
