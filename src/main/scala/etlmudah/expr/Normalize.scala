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

/** Accent folding — NFD decomposition with combining marks stripped
  * (café → cafe, Ångström → Angstrom): the diacritic-insensitive
  * matching/dedup key next to [[NfcNormalizeFn]]'s canonicalization.
  * Deliberately NOT transliteration: base letters without combining-
  * mark decompositions (œ, ß, đ) pass through — which is exactly
  * DuckDB's `strip_accents` semantics, so the oracle replays the fold
  * verbatim (parity spot-checked across the Latin-1/Extended fixture
  * family). Same zero-allocation fast path: an input with no
  * combining marks after the NFD quick-check returns untouched. */
object FoldAccentsFn {
  def fold(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd =
      if (Normalizer.isNormalized(str, Normalizer.Form.NFD)) str
      else Normalizer.normalize(str, Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < nfd.length && !hasMark) {
      val t = Character.getType(nfd.charAt(i))
      hasMark = t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK ||
        t == Character.ENCLOSING_MARK
      i += 1
    }
    if (!hasMark) {
      if (nfd eq str) s else UTF8String.fromString(nfd)
    } else {
      val sb = new java.lang.StringBuilder(nfd.length)
      var j = 0
      while (j < nfd.length) {
        val c = nfd.charAt(j)
        val t = Character.getType(c)
        if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.append(c)
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** Native expression `graft_fold_accents(string)` — see
  * [[FoldAccentsFn]]. Null in, null out. */
case class FoldAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fold_accents expects string, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fold_accents"

  override def nullSafeEval(input: Any): Any =
    FoldAccentsFn.fold(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"etlmudah.expr.FoldAccentsFn.fold($c)")

  override protected def withNewChildInternal(
      newChild: Expression): FoldAccents = copy(child = newChild)
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
