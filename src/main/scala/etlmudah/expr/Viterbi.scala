package etlmudah.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UNIGRAM-LATTICE VITERBI segmentation — the second tokenizer family
  * next to the BPE tier ([[BpeFoldFn]]): where BPE applies learned
  * merges bottom-up, the unigram model (Kudo 2018, the SentencePiece
  * default) picks, among ALL segmentations of the text into vocabulary
  * pieces, the one maximizing the summed piece weights — solved
  * exactly by dynamic programming over text positions.
  *
  * Weights are INTEGER scores supplied with the vocabulary (a trainer
  * would pass scaled log-probs; the engine's contract is exact-integer
  * so every decision is portable and replayable — the lattice
  * discipline). Characters no vocabulary piece covers segment as
  * single-character unknowns at [[UnigramViterbiFn.UnkPenalty]], so
  * every text has a complete lattice path.
  *
  * Decision rule, fully deterministic: maximize total weight; on a
  * tied score at a position prefer the LONGER piece ending there
  * (leftmost-longest convention); an unknown never beats a known
  * piece of the same length and score. Offsets are Java char units
  * (the BMP-only testdata convention; supplementary-plane text would
  * want codepoint offsets).
  *
  * Why a custom Expression (the BpeFold rationale): the DP is one
  * plan node and one static call inside whole-stage codegen; a
  * higher-order-function formulation would nest a lambda per position
  * and hit Catalyst's super-linear nested-lambda planning cost. */
object UnigramViterbiFn {

  /** Fixed per-character unknown penalty — part of the portable
    * contract (oracles and replays must use the same constant). */
  val UnkPenalty: Long = -1000000L

  def segment(text: UTF8String, toks: ArrayData, wts: ArrayData): ArrayData = {
    val s = text.toString
    val n = s.length
    val nv = toks.numElements()
    require(wts.numElements() == nv,
      s"graft_viterbi: $nv tokens vs ${wts.numElements()} weights")
    val vocab = new java.util.HashMap[String, java.lang.Long](nv * 2)
    var maxLen = 1
    var vi = 0
    while (vi < nv) {
      val t = toks.getUTF8String(vi).toString
      require(t.nonEmpty, "graft_viterbi: empty vocabulary piece")
      vocab.put(t, java.lang.Long.valueOf(wts.getLong(vi)))
      if (t.length > maxLen) maxLen = t.length
      vi += 1
    }
    val NEG = Long.MinValue / 4
    val best = new Array[Long](n + 1)
    val backLen = new Array[Int](n + 1)   // piece length chosen at i
    val backTok = new Array[Boolean](n + 1) // vocab piece vs unknown char
    var i = 1
    while (i <= n) {
      // the unknown single char is always available
      var bs = best(i - 1) + UnkPenalty
      var bl = 1
      var bt = false
      var l = 1
      val lmax = math.min(maxLen, i)
      while (l <= lmax) {
        val w = vocab.get(s.substring(i - l, i))
        if (w != null) {
          val cand = best(i - l) + w.longValue
          // strictly better, or tied with a longer piece, or tied with
          // the same-length unknown (a known piece outranks unknown)
          if (cand > bs || (cand == bs && (l > bl || (l == bl && !bt)))) {
            bs = cand; bl = l; bt = true
          }
        }
        l += 1
      }
      best(i) = if (bs < NEG) NEG else bs
      backLen(i) = bl
      backTok(i) = bt
      i += 1
    }
    // reconstruct right-to-left
    var cnt = 0
    var p = n
    while (p > 0) { cnt += 1; p -= backLen(p) }
    val out = new Array[AnyRef](cnt)
    p = n
    var k = cnt - 1
    while (p > 0) {
      out(k) = UTF8String.fromString(s.substring(p - backLen(p), p))
      k -= 1
      p -= backLen(p)
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}

/** Native Catalyst expression `graft_viterbi(text, tokens, weights)` —
  * see [[UnigramViterbiFn]]. `tokens`/`weights` are parallel
  * array<string>/array<bigint> (typically literals: the learned
  * vocabulary). */
case class UnigramViterbi(first: Expression, second: Expression,
                          third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType == StringType || first.dataType == NullType) &&
      (second.dataType match {
        case ArrayType(StringType, _) | NullType => true; case _ => false
      }) &&
      (third.dataType match {
        case ArrayType(LongType, _) | NullType => true; case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_viterbi expects (string, array<string>, array<bigint>), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_viterbi"

  override def nullSafeEval(t: Any, tk: Any, w: Any): Any =
    UnigramViterbiFn.segment(t.asInstanceOf[UTF8String],
      tk.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, tk, w) => s"""
      ${ev.value} = etlmudah.expr.UnigramViterbiFn.segment($t, $tk, $w);
    """)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UnigramViterbi =
    copy(first = f, second = s, third = t)
}
