package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Bloom-membership counter — the memory-bounded serving shape
  * of benchmark decontamination: for one document's shingle-hash array
  * (the [[NGramMd5]] output), count the shingle POSITIONS whose hash
  * tests positive against a bitmap built from the benchmark's shingle
  * set. The bitmap rides into the expression like the IVF centroids
  * and the [[MaxCosHits]] benchmark matrix — benchmark-derived state is
  * config-sized by contract — so the corpus pass is map-only, zero
  * shuffle, zero join.
  *
  * Why a Bloom gate when the exact semi-join exists
  * ([[graft.llmops.Pipeline.decontaminate]]): the exact pass broadcasts
  * the benchmark's DISTINCT shingle-hash set, whose hash-relation costs
  * tens of bytes per entry — a 10M-question eval suite is hundreds of
  * millions of shingles, a multi-GB broadcast per executor. At `k` bits
  * per element this bitmap is ~10 bits/shingle for a ~1% false-positive
  * rate, and a false positive can only OVER-flag (a document dropped
  * that didn't strictly need it) — the safe direction for contamination
  * hygiene, same argument as the 32-bit hash truncation.
  *
  * Everything is deterministic integer arithmetic the SQL oracle
  * replays digit-for-digit: bit `i` of hash `h` is
  * `((a_i · (h mod P31) + b_i) mod P31) mod mBits` over the SAME
  * (a, b) family MinHash draws from ([[graft.llmops.Dedup.permParams]];
  * reducing `h` first keeps `a·h` inside a signed long). A hash hits
  * iff all `k` probe bits are set.
  */
case class BloomHits(child: Expression, words: Seq[Long], mBits: Int,
    params: Seq[(Long, Long)]) extends UnaryExpression {

  require(mBits > 0 && mBits % 64 == 0 && words.length == mBits / 64,
    "bitmap words must cover exactly mBits bits")
  require(params.nonEmpty, "need at least one probe function")

  private val P31 = 2147483647L // 2^31 - 1, the MinHash modulus

  override def dataType: DataType = LongType

  @transient private lazy val w: Array[Long] = words.toArray
  @transient private lazy val as: Array[Long] = params.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = params.map(_._2).toArray

  def compute(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val k = as.length
    var hits = 0L
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i) % P31
      var all = true
      var j = 0
      while (all && j < k) {
        val p = ((as(j) * h + bs(j)) % P31 % mBits).toInt
        all = (w(p >>> 6) & (1L << (p & 63))) != 0L
        j += 1
      }
      if (all) hits += 1L
      i += 1
    }
    hits
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Reference-object call: the probe loop runs as compiled Scala and
    * the enclosing stage keeps whole-stage codegen (the NGramMd5
    * precedent — a CodegenFallback would break the stage). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHits", this, classOf[BloomHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_hits"
}

object BloomHits {
  def apply(hashes: Column, words: Seq[Long], mBits: Int,
      params: Seq[(Long, Long)]): Column =
    GraftBridge.column(BloomHits(GraftBridge.expression(hashes), words, mBits, params))

  /** Driver-side bitmap build from the benchmark's distinct shingle
    * hashes (benchmark-sized by contract — the decontaminateSemantic
    * collect discipline). */
  def buildWords(hashes: Array[Long], mBits: Int,
      params: Seq[(Long, Long)]): Seq[Long] = {
    val P31 = 2147483647L
    val w = new Array[Long](mBits / 64)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i) % P31
      params.foreach { case (a, b) =>
        val p = ((a * h + b) % P31 % mBits).toInt
        w(p >>> 6) |= 1L << (p & 63)
      }
      i += 1
    }
    w.toSeq
  }
}
