package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Native stupid-backoff LM scorer — the SERVING shape of
  * [[graft.llmops.Pipeline.lmScore]]: the capped bigram/unigram model
  * (built once by [[graft.llmops.Pipeline.lmModel]], config-sized by
  * contract) rides INSIDE the expression like the [[BloomHits]] bitmap
  * and the [[MaxCosHits]] benchmark matrix, so scoring a document is a
  * stateless per-row column — one md5+lookup loop per document, zero
  * join, zero shuffle, and the SAME plan runs under Structured
  * Streaming unchanged (the deconGate/bloomGate pattern).
  *
  * Hashing is bit-identical to [[NGramMd5]] (15-hex md5 fold of the
  * space-joined n-gram), and the backoff arithmetic is the batch
  * operator's (ln(c2/c1p) → ln(0.4·c1/N) → ln(0.4/N), mean negated,
  * HALF_UP-rounded to 4 decimals) — the per-document sum here runs in
  * POSITION order where the batch aggregate sums in partition order,
  * which the 4-decimal rounding absorbs (operator scaladoc). Model
  * keys are sorted once per instance; each position costs two binary
  * searches worst-case.
  *
  * Returns struct(n_scored, xent), xent NULL when the document has
  * fewer than two tokens.
  */
case class LmXent(child: Expression,
    bgKeys: Seq[Long], bgC2: Seq[Long], bgC1p: Seq[Long],
    uniKeys: Seq[Long], uniC1: Seq[Long], nRef: Long)
    extends UnaryExpression {

  require(bgKeys.length == bgC2.length && bgKeys.length == bgC1p.length,
    "bigram model columns must align")
  require(uniKeys.length == uniC1.length, "unigram model columns must align")
  require(nRef > 0, "reference token total must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("n_scored", LongType, nullable = false),
    StructField("xent", DoubleType, nullable = true)))

  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  // sort each model by key once; parallel value arrays follow the sort
  @transient private lazy val (bgK, bgV2, bgVp) = {
    val idx = bgKeys.indices.sortBy(bgKeys)
    (idx.map(bgKeys).toArray, idx.map(bgC2).toArray, idx.map(bgC1p).toArray)
  }
  @transient private lazy val (unK, unV) = {
    val idx = uniKeys.indices.sortBy(uniKeys)
    (idx.map(uniKeys).toArray, idx.map(uniC1).toArray)
  }

  private def h15(digest: java.security.MessageDigest, s: String): Long = {
    digest.reset()
    val md = digest.digest(s.getBytes("UTF-8"))
    var acc = 0L
    var k = 0
    while (k < 15) {
      val b = md(k / 2) & 0xff
      val nib = if (k % 2 == 0) b >>> 4 else b & 0xf
      acc = (acc << 4) | nib
      k += 1
    }
    acc
  }

  def compute(tokens: ArrayData): InternalRow = {
    val digest = digests.get()
    val n = tokens.numElements()
    if (n < 2) return new GenericInternalRow(Array[Any](0L, null))
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = tokens.getUTF8String(i).toString; i += 1 }
    var sum = 0.0
    i = 0
    while (i < n - 1) {
      val bgh = h15(digest, toks(i) + " " + toks(i + 1))
      val bi = java.util.Arrays.binarySearch(bgK, bgh)
      if (bi >= 0) sum += math.log(bgV2(bi).toDouble / bgVp(bi))
      else {
        val ui = java.util.Arrays.binarySearch(unK, h15(digest, toks(i + 1)))
        if (ui >= 0) sum += math.log(0.4 * unV(ui) / nRef)
        else sum += math.log(0.4 / nRef)
      }
      i += 1
    }
    val xent = java.math.BigDecimal.valueOf(-(sum / (n - 1)))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any]((n - 1).toLong, xent))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmXent", this, classOf[LmXent].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_lm_xent"
}

object LmXent {
  def apply(tokens: Column, model: graft.llmops.Pipeline.LmModel): Column =
    GraftBridge.column(LmXent(GraftBridge.expression(tokens),
      model.bgKeys, model.bgC2, model.bgC1p,
      model.uniKeys, model.uniC1, model.nRef))
}
