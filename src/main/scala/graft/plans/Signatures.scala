package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass signature kernels for the dedup operators (SURVEY §2.B.12).
  *
  * Round-1 computed MinHash/SimHash signatures as per-permutation
  * `aggregate()` higher-order folds — 16 (resp. 60) separate interpreted
  * expression-tree walks per row, the two slowest queries in the driver
  * bench (VERDICT round 1, "What's wrong" #1). These expressions replace
  * the folds with a single compiled pass over the hash array; the
  * arithmetic is unchanged, so the DuckDB oracle twins still match
  * bit-for-bit.
  *
  * Codegen: `doGenCode` emits a call to the expression's own `compute`
  * via a reference object — the enclosing stage stays inside whole-stage
  * codegen (no CodegenFallback barrier) and the per-row loop runs as
  * compiled Scala rather than a Janino-inlined expression tree.
  */
object Signatures {
  /** 2^31 - 1 (Mersenne prime) — the modulus shared with the SQL oracle. */
  val P31: Long = 2147483647L
}

/** MinHash signature over `array<long>` raw shingle hashes: for each
  * permutation i, s_i = min over h of (a_i * (h mod P31) + b_i) mod P31,
  * with P31 as the empty-input identity — element-for-element the fold
  * `aggregate(transform(hs, h -> h % P31), P31, (acc, h) ->
  * least(acc, (a*h+b) % P31))` it replaces (the `% P31` reduction is
  * folded in, removing the interpreted `transform` too). */
case class MinHashSig(child: Expression, permA: Seq[Long], permB: Seq[Long])
    extends UnaryExpression {

  require(permA.length == permB.length && permA.nonEmpty, "permutation params")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val aArr = permA.toArray
  @transient private lazy val bArr = permB.toArray

  def compute(input: ArrayData): ArrayData = {
    val nPerm = aArr.length
    val out = new Array[Long](nPerm)
    java.util.Arrays.fill(out, Signatures.P31)
    val n = input.numElements()
    var e = 0
    while (e < n) {
      val hm = input.getLong(e) % Signatures.P31
      var p = 0
      while (p < nPerm) {
        val v = (aArr(p) * hm + bArr(p)) % Signatures.P31
        if (v < out(p)) out(p) = v
        p += 1
      }
      e += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSig {
  def apply(hashes: Column, perms: Seq[(Long, Long)]): Column =
    GraftBridge.column(
      MinHashSig(GraftBridge.expression(hashes), perms.map(_._1), perms.map(_._2)))
}

/** SimHash over `array<long>` token hashes of width `bits`: bit i of the
  * result is set iff the count of elements with bit i set satisfies
  * cnt * 2 > n (strict majority over ALL elements). Empty input → 0 —
  * identical to the 60 per-bit `aggregate()` popcount folds it replaces. */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 63, "bits must fit a signed long")

  override def dataType: DataType = LongType

  def compute(input: ArrayData): Long = {
    val n = input.numElements()
    val counts = new Array[Int](bits)
    var e = 0
    while (e < n) {
      var h = input.getLong(e)
      var i = 0
      while (h != 0L && i < bits) {
        if ((h & 1L) != 0L) counts(i) += 1
        h >>>= 1
        i += 1
      }
      e += 1
    }
    var sim = 0L
    var i = 0
    while (i < bits) {
      if (counts(i) * 2 > n) sim |= 1L << i
      i += 1
    }
    sim
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashBits", this, classOf[SimHashBits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_bits"
}

object SimHashBits {
  def apply(hashes: Column, bits: Int): Column =
    GraftBridge.column(SimHashBits(GraftBridge.expression(hashes), bits))
}
