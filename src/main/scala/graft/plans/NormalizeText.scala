package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode canonicalization — the standard text normalization
  * pass BEFORE exact/fingerprint dedup (visually-identical strings
  * must hash identically): NFD-decompose, drop combining marks
  * (accent strip), NFC-recompose, lowercase in the root locale.
  * "Café" ≡ "Café" ≡ "cafe" afterwards — without this, the
  * composed and decomposed spellings of the same text land in
  * different exact-dedup groups. Spark has no built-in normalizer;
  * this wraps `java.text.Normalizer` as one compiled pass (the
  * [[RollingHash]] reference-object pattern, stage stays in codegen).
  * The DuckDB twin `lower(strip_accents(nfc_normalize(x)))` agrees on
  * the fixture corpus (ASCII is a fixed point of every step); the
  * Unicode semantics are pinned by the spec's planted diacritics —
  * declared scope, since utf8proc and ICU can disagree on exotic
  * scripts' case mappings.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  // combining marks leave after NFD: Mn (nonspacing) is the accent
  // class; the pattern object is shared — Matcher is created per call
  @transient private lazy val marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // ASCII fast path: every step is the identity above lowercase
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return UTF8String.fromString(str.toLowerCase(java.util.Locale.ROOT))
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val stripped = marks.matcher(nfd).replaceAll("")
    val nfc = java.text.Normalizer.normalize(stripped, java.text.Normalizer.Form.NFC)
    UTF8String.fromString(nfc.toLowerCase(java.util.Locale.ROOT))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normalizeText", this, classOf[NormalizeText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize_text"
}

object NormalizeText {
  def apply(text: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(text)))
}
