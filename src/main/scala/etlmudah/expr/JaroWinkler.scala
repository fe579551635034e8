package etlmudah.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro-Winkler kernel, factored into a static method so BOTH the
  * interpreted path and the generated code call the same bytes-in,
  * double-out routine (a Scala object with no companion class compiles
  * with a static forwarder, so generated Java calls
  * `etlmudah.expr.JaroWinklerFn.sim(a, b)` directly — one static call
  * inside whole-stage codegen, no boxing, no UDF serialization).
  *
  * Convention pinned to DuckDB's `jaro_winkler_similarity` (probed on
  * fixtures, spec-asserted) so the record-linkage queries carry a real
  * cross-engine oracle:
  *  - match window = max(⌊max(l1,l2)/2⌋ − 1, 0)
  *  - transpositions = (mismatched matched chars) / 2, INTEGER division
  *    (odd counts round down — 'abcdef' vs 'bcadef' = 17/18)
  *  - Winkler boost 0.1 × min(prefix, 4) × (1 − jaro), applied only
  *    when jaro > 0.7 (strict)
  *  - either side empty ⇒ 0.0 (including both empty)
  *
  * Operates on raw UTF-8 BYTES: identical to character semantics on
  * ASCII (the linkage keys here); multi-byte code points compare
  * per-byte, which is still a valid similarity but not the code-point
  * Jaro — callers linking non-ASCII names should normalize upstream. */
object JaroWinklerFn {
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!f2(j) && s1(i) == s2(j)) {
          f1(i) = true; f2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1(i) != s2(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && s1(prefix) == s2(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** Native Catalyst expression `graft_jaro_winkler(string, string)` —
  * the classic record-linkage similarity (Winkler 1990, census
  * name-matching), used by the blocked fuzzy-link tier
  * (`joins.Joins.fuzzyLinkPairs`).
  *
  * Why a custom Expression (SURVEY §7.4 custom-piece slot): the
  * matching pass needs two flag arrays and a two-pointer walk — not
  * expressible as built-in functions without an interpreted HOF or a
  * UDF. As an Expression it stays inside whole-stage codegen: the
  * generated code makes one static call into [[JaroWinklerFn.sim]],
  * no row-object boxing, no serialization.
  *
  * Null if either input is null (BinaryExpression default). */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  // NullType is accepted so a bare NULL literal resolves and evaluates
  // to NULL (DuckDB: jaro_winkler_similarity(NULL, x) IS NULL) instead
  // of failing analysis; a NullType child never reaches nullSafeEval.
  private def okType(t: DataType): Boolean =
    t == StringType || t == NullType

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerFn.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"etlmudah.expr.JaroWinklerFn.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
