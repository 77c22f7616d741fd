package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Native Naive-Bayes scorer — the SERVING shape of
  * [[graft.llmops.Pipeline.nbClassifier]]: the capped llr vocabulary
  * (config-sized by the vocab-cap contract) rides INSIDE the
  * expression like the [[LmXent]] model, so scoring a document is a
  * stateless per-row column — one hash-lookup loop, zero join, zero
  * shuffle, and the SAME plan runs under Structured Streaming
  * unchanged (the pplGate pattern).
  *
  * Arithmetic mirrors the batch operator: score = HALF-UP
  * round(prior + Σ llr(t), 4) over in-vocab tokens (Spark's round()
  * semantics); the per-document
  * sum runs in POSITION order where the batch aggregate sums in
  * partition order, which the 4-decimal rounding absorbs (batch
  * scaladoc). Out-of-vocab tokens skip; a document with none scores
  * prior-only — identical to the batch outer-row contract.
  *
  * Returns struct(n_scored, score).
  */
case class NbScore(child: Expression, vocab: Seq[(String, Double)],
    prior: Double) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_scored", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  // read-only after lazy-val init (synchronized) — safe to share
  // across the stage's task threads
  @transient private lazy val llr: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach { case (t, v) => m.putIfAbsent(t, java.lang.Double.valueOf(v)) }
    m
  }

  def compute(tokens: ArrayData): InternalRow = {
    var sum = prior
    var scored = 0L
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val v = llr.get(tokens.getUTF8String(i).toString)
      if (v != null) { sum += v.doubleValue(); scored += 1 }
      i += 1
    }
    val score = java.math.BigDecimal.valueOf(sum)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    new GenericInternalRow(Array[Any](scored, score))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbScore", this, classOf[NbScore].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nb_score"
}

object NbScore {
  def apply(tokens: Column, vocab: Seq[(String, Double)], prior: Double): Column =
    GraftBridge.column(NbScore(GraftBridge.expression(tokens), vocab, prior))
}
