package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native n-gram md5 hasher: `array<string>` tokens → `array<long>`
  * hashes of the space-joined n-gram shingles, where each hash is the
  * integer value of the first `hexChars` hex digits of the shingle's
  * md5 — EXACTLY `conv(substring(md5(shingle),1,hexChars),16,10)`, the
  * formula the DuckDB oracle replicates digit-by-digit.
  *
  * Replaces the interpreted higher-order chain
  * `transform(shingles(text,n), sh => conv(substring(md5(sh),1,w),16,10))`
  * (SURVEY §2.B.11: custom Expression beats UDF beats HOF): one JVM-level
  * pass per row, one reused MessageDigest, no hex-string round-trip —
  * the per-shingle cost drops from an expression-tree walk with string
  * formatting/parsing to a digest + shift loop.
  *
  * n = 1 hashes the tokens themselves (the SimHash path); n ≥ 2 hashes
  * shingles (the MinHash path). Fewer than n tokens → empty array,
  * matching `TextOps.shingles`.
  */
case class NGramMd5(child: Expression, n: Int, hexChars: Int)
    extends UnaryExpression {

  require(hexChars > 0 && hexChars <= 15, "hexChars must fit a signed long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // expression instances can be shared across local-mode task threads
  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(tokens: ArrayData): ArrayData = {
    val digest = digests.get()
    val nTok = tokens.numElements()
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    // token UTF-8 bytes decoded ONCE per row (r17, guide §1.2 per-task
    // work): the StringBuilder form converted every token to a fresh
    // java.lang.String and re-encoded it to UTF-8 once PER WINDOW —
    // ~n× per token, the dedup family's hottest allocation site. The
    // digest consumes the identical byte stream ("tok1 tok2 … tokn"
    // UTF-8, 0x20 separators), so every hash is bit-identical.
    val tb = new Array[Array[Byte]](nTok)
    var t = 0
    while (t < nTok) { tb(t) = tokens.getUTF8String(t).getBytes; t += 1 }
    val out = new Array[Long](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      digest.reset()
      var j = 0
      while (j < n) {
        if (j > 0) digest.update(0x20.toByte)
        digest.update(tb(i + j))
        j += 1
      }
      val md = digest.digest()
      // value of the first hexChars hex digits, big-endian
      var acc = 0L
      var k = 0
      while (k < hexChars) {
        val b = md(k / 2) & 0xff
        val nib = if (k % 2 == 0) b >>> 4 else b & 0xf
        acc = (acc << 4) | nib
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Calls [[compute]] through a reference object: the digest loop runs
    * as compiled Scala and the enclosing stage keeps whole-stage codegen
    * (the round-1 CodegenFallback broke the stage — VERDICT "wrong" #2). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramMd5", this, classOf[NGramMd5].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_ngram_md5"
}

object NGramMd5 {
  def apply(tokens: Column, n: Int, hexChars: Int): Column =
    GraftBridge.column(NGramMd5(GraftBridge.expression(tokens), n, hexChars))
}
