package etlmudah.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character n-gram COUNTS
  * (`graft_char_ngram_counts(text, n)` -> array<struct<g string, c bigint>>):
  * every window of `n` consecutive code points, with its occurrence
  * count within the row, in one pass over the string.
  *
  * Why a custom Expression (the graft_cosine precedent): the composed
  * formulation — `explode(sequence(1, length(t)-n+1))` + `substr(t, i, n)`
  * + a (id, gram) count aggregate — pays three corpus-char-scale costs
  * the single pass avoids: `substr(t, i, n)` re-walks the string prefix
  * per call (UTF8String indexes code points, so the explode totals
  * O(len²) char steps per row), the explode materializes one row per
  * POSITION (corpus chars, not distinct grams), and the count aggregate
  * hashes all of those rows again. Here each row emits only its
  * DISTINCT grams, pre-counted — the fan-out entering any downstream
  * shuffle drops from positions to distinct grams, and the count
  * aggregate disappears (per-row counts are exact; callers needing
  * corpus counts sum struct counts, a strictly smaller frame).
  *
  * Exactness contract (pinned by TextStatsSpec against the
  * explode+substr formulation, including astral-plane code points):
  * grams are CODE-POINT windows — `new String(codePoints, i, n)` is
  * byte-identical to `substr(t, i+1, n)` on any valid UTF-8 input.
  * Rows shorter than `n` code points emit an empty array (exactly the
  * empty explode of the sequence formulation). Null input -> null.
  * Emission order is first-occurrence, which callers must not rely on
  * (downstream aggregates/windows order explicitly).
  *
  * CodegenFallback is deliberate: one eval per ROW with the heavy loop
  * inside native JVM code — the per-row boxing the fallback costs is
  * noise next to the per-position work it replaces (the BpeFold
  * precedent). */
case class CharNgramCounts(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1 && n <= 64, s"graft_char_ngram_counts n out of range: $n")

  override def prettyName: String = "graft_char_ngram_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngram_counts expects string, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val total = cps.length - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    // LinkedHashMap: deterministic first-occurrence emission order
    val m = new java.util.LinkedHashMap[String, Array[Long]]()
    var i = 0
    while (i < total) {
      val g = new String(cps, i, n)
      val slot = m.get(g)
      if (slot == null) m.put(g, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val rows = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      rows(k) = InternalRow(UTF8String.fromString(e.getKey), e.getValue()(0))
      k += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(c: Expression): CharNgramCounts =
    copy(child = c)
}
