package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DEFLATE-size kernel — the compression-ratio quality signal
  * of the Gopher/MassiveText filter family: highly compressible text
  * (boilerplate, keyword stuffing, repeated n-grams) is low-entropy
  * junk, and bytes-per-deflated-byte is the cheapest robust proxy.
  * Returns the deflated byte count of the UTF-8 text; the caller
  * divides once for the ratio.
  *
  * Determinism: a fixed level (6), default strategy, no preset
  * dictionary — the stream depends only on the input bytes and the
  * JDK's bundled zlib, so results are stable within an environment
  * (the spec asserts ORDER properties — repetitive < shuffled — and
  * exact rerun equality, not magic byte counts; there is deliberately
  * no SQL twin, the BPE-learn precedent). One compiled map-only pass;
  * the Deflater is thread-confined and RESET between rows (allocating
  * per row measured ~3× slower; sharing across threads corrupts). */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val deflaters =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(6, false))

  @transient private lazy val buffers =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](1 << 16))

  def compute(s: UTF8String): Int = {
    val in = s.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(in)
    d.finish()
    var total = 0
    val buf = buffers.get()
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateSize", this, classOf[DeflateSize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_deflate_size"
}

object DeflateSize {
  def apply(text: Column): Column =
    GraftBridge.column(DeflateSize(GraftBridge.expression(text)))
}
