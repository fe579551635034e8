package etlmudah.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge-application kernel, factored static (the
  * [[JaroWinklerFn]] pattern): apply a LIST of merges, in order, each
  * left-to-right inside a symbol array — "bbb" under (b,b) becomes
  * [bb, b], the reference trainers' simultaneous non-overlapping
  * replacement. Shared by training and encoding so they can never
  * drift.
  *
  * Why a custom Expression: the built-in formulation is one
  * higher-order `aggregate` fold PER MERGE, nested `maxBatch` (or, for
  * encoding, merge-list) deep — and Catalyst's optimizer is
  * super-linear in nested-lambda trees (the measured pathology that
  * moved the BMP pixel walk native). Here the whole batch is ONE plan
  * node and one static call inside whole-stage codegen, so per-round
  * planning cost is constant in `maxBatch`. */
object BpeFoldFn {
  def fold(syms: ArrayData, lefts: ArrayData, rights: ArrayData): ArrayData = {
    var cur = syms.toArray[UTF8String](StringType)
    val n = lefts.numElements()
    var m = 0
    while (m < n) {
      val l = lefts.getUTF8String(m)
      val r = rights.getUTF8String(m)
      val out = new Array[UTF8String](cur.length)
      var k = 0
      var i = 0
      while (i < cur.length) {
        val s = cur(i)
        if (k > 0 && out(k - 1) == l && s == r) {
          out(k - 1) = UTF8String.concat(l, r)
        } else {
          out(k) = s
          k += 1
        }
        i += 1
      }
      cur = if (k == out.length) out else java.util.Arrays.copyOf(out, k)
      m += 1
    }
    new GenericArrayData(cur.asInstanceOf[Array[Any]])
  }
}

/** Native Catalyst expression
  * `graft_bpe_fold(syms, lefts, rights)` — see [[BpeFoldFn]]. `lefts`
  * and `rights` are parallel array<string> merge lists (typically
  * literals: the round's accepted batch in training, the learned table
  * in encoding). */
case class BpeFold(first: Expression, second: Expression,
                   third: Expression) extends TernaryExpression {

  private val arr = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => (c.dataType match {
      case ArrayType(StringType, _) => true
      case NullType => true
      case _ => false
    })))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_bpe_fold expects (array<string>, array<string>, " +
        "array<string>), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = arr
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_bpe_fold"

  override def nullSafeEval(s: Any, l: Any, r: Any): Any =
    BpeFoldFn.fold(s.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, l, r) =>
      s"etlmudah.expr.BpeFoldFn.fold($s, $l, $r)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BpeFold =
    BpeFold(f, s, t)
}
