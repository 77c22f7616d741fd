package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native product-quantization ENCODE kernel — per subspace, the
  * argmin-L2 codeword of the input vector's slice, as one
  * `array<int>` of 0-based codes. The codebooks ride inside the
  * expression as literals (the [[MaxCosHits]] matrix doctrine), so
  * encoding is a single fused map-only pass.
  *
  * Replaces the column-expression formulation (an
  * `array(m × nCodes × (dot − 2·dot + dot))` tree per row), which
  * grew past janino's 64 KB method limit at m=4 × nCodes=16 × 16-dim
  * codewords and dropped the whole stage out of codegen — the encode
  * ran interpreted, allocating one Column tree evaluation per
  * distance. This kernel is the same arithmetic in a tight loop.
  *
  * Arithmetic is PINNED to the expression it replaces (and to the
  * DuckDB `pcb2` oracle replay): per codeword,
  * `(dot(s,s) − 2.0·dot(s,c)) + dot(c,c)` with strict left-to-right
  * IEEE accumulation in every dot product, ties to the FIRST minimum
  * (= smallest code id, `array_position`'s rule). `dot(c,c)`
  * precomputes per codeword at first use — a literal-fold value is
  * bit-identical to re-deriving it row-side (same op sequence). A
  * vector shorter than the codebook dimension encodes its available
  * prefix per subspace (slice semantics), matching `slice()`. */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val bookArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  @transient private lazy val dsub: Int = bookArr(0)(0).length

  @transient private lazy val cc: Array[Array[Double]] =
    bookArr.map(_.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

  def compute(input: ArrayData): ArrayData = {
    val v = input.toDoubleArray()
    val m = bookArr.length
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * dsub
      val n = math.max(0, math.min(dsub, v.length - off))
      // dot(s, s) once per subspace — strict LTR like the kernel dot
      var ss = 0.0
      var i = 0
      while (i < n) { ss += v(off + i) * v(off + i); i += 1 }
      var best = 0
      var bestD = Double.MaxValue
      val cws = bookArr(mi)
      var code = 0
      while (code < cws.length) {
        val c = cws(code)
        var sc = 0.0
        var j = 0
        val nn = math.min(n, c.length)
        while (j < nn) { sc += v(off + j) * c(j); j += 1 }
        val d = (ss - 2.0 * sc) + cc(mi)(code)
        if (d < bestD) { bestD = d; best = code } // first minimum wins
        code += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

object PqEncode {
  def apply(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), books))
}
