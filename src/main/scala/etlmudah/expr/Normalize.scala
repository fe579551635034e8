package etlmudah.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical composition (NFC) — the normalization step in
  * front of [[etlmudah.text.TextStats.cleanText]]'s ASCII-fold ladder:
  * a crawled corpus carries the SAME grapheme in composed (U+00E9 é)
  * and decomposed (e + U+0301) spellings, and every downstream exact
  * hash, shingle, and fingerprint tier treats them as different text
  * unless the corpus is canonicalized first (the UAX #15 motivation;
  * DuckDB ships the same operation as `nfc_normalize`, which is what
  * the oracle replays against).
  *
  * Spark has no built-in normalizer, so this wraps the JDK's ICU-grade
  * [[java.text.Normalizer]] as a codegen'd unary expression — one
  * static call per row, no UDF boxing. Fast path: real corpora are
  * overwhelmingly already-NFC, and `Normalizer.isNormalized` is a
  * cheap scan (quick-check property lookup) that lets those rows
  * return the INPUT buffer untouched — zero allocation on the hot
  * path, the composition table only runs on the rare denormalized
  * row. */
object NfcNormalizeFn {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Native expression `graft_nfc(string)` — see [[NfcNormalizeFn]].
  * Null in, null out (UnaryExpression default). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeFn.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"etlmudah.expr.NfcNormalizeFn.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}
