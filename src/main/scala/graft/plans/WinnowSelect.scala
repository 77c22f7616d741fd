package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Native winnowing fingerprint selector (Schleimer/Wilkerson/Aiken
  * 2003 — the MOSS algorithm): over an `array<long>` of k-gram hashes,
  * slide a `w`-hash window and select each window's minimum, taking the
  * RIGHTMOST occurrence on ties; consecutive windows re-selecting the
  * same position collapse to one fingerprint. Guarantee: two documents
  * sharing any run of `w + k − 1` tokens share at least one selected
  * fingerprint — the robust sparse fingerprint the full-document hash
  * ([[RollingHash]]) cannot give. Fewer than `w` hashes → the whole
  * array is one window (the paper's short-document convention); an
  * empty array selects nothing.
  *
  * Selections are monotone in position (the rightmost-min of window
  * i+1 can never sit left of window i's — the dropped position is the
  * only one lost, and any surviving candidate was already beaten), so
  * the adjacent-repeat collapse IS the full dedupe; a SQL oracle
  * reaches the same set with a plain DISTINCT over all windows'
  * selections. One compiled pass per row, O(n·w) with w a small
  * constant; the enclosing stage keeps whole-stage codegen (the
  * [[NGramMd5]] reference-object pattern).
  *
  * Returns `array<struct<pos:int, fp:long>>` with `pos` the 0-based
  * index into the hash array, strictly increasing.
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {

  require(w > 0, "winnow window must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)

  def compute(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val nWindows = math.max(n - w + 1, 1)
    var lastPos = -1
    var i = 0
    while (i < nWindows) {
      val end = math.min(i + w, n) // short-array window clips to n
      var mp = i
      var mv = hashes.getLong(i)
      var j = i + 1
      while (j < end) {
        val v = hashes.getLong(j)
        if (v <= mv) { mv = v; mp = j } // <= keeps the RIGHTMOST min
        j += 1
      }
      if (mp != lastPos) {
        out += new GenericInternalRow(Array[Any](mp, mv))
        lastPos = mp
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowSelect", this, classOf[WinnowSelect].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object WinnowSelect {
  def apply(hashes: Column, w: Int): Column =
    GraftBridge.column(WinnowSelect(GraftBridge.expression(hashes), w))
}
