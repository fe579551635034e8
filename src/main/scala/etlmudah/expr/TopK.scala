package etlmudah.expr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BOUNDED TOP-K aggregate (`graft_topk(score, tag, k)`) — the
  * window-free ranked-top-N-per-group operator.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC)` — the
  * shape behind the reference's "top N per group" dashboards
  * (streamlit value_counts().head(n) tier) — shuffles EVERY row of
  * the frame to its group's partition and sorts it, even though all
  * but k rows per group are discarded. At 100 TB that is the whole
  * fact table through one exchange. This aggregate keeps a k-bounded
  * binary min-heap as its buffer, so partial aggregation applies:
  * each map task folds its partition into local heaps and the shuffle
  * moves AT MOST k rows per (group x partition) — the same contract
  * as any sum, with the heap as the monoid.
  *
  * Order is the STRICT total order (score DESC, tag ASC): ties on
  * score break on the tag string, which makes the top-k SET (and
  * hence the result) independent of partitioning and arrival order —
  * the property the oracle needs. Tag order is UTF-8 BINARY order
  * (`UTF8String.binaryCompare`), i.e. code-point order — identical to
  * Spark SQL string ORDER BY and DuckDB, NOT `java.lang.String
  * .compareTo`'s UTF-16 code-unit order (which sorts supplementary-
  * plane tags before U+E000..U+FFFF and would silently pick a
  * different top-k than the row_number-window oracle). Callers who
  * want numeric tag order zero-pad the tag. Null score or null tag
  * rows are skipped.
  *
  * Result: array<struct<score:double, tag:string>> sorted strong→weak
  * (score DESC, tag ASC) — explode with posexplode for (rank, row)s.
  *
  * The buffer is a plain binary heap on (score ASC, tag DESC) — the
  * ROOT is the weakest survivor, so update is O(log k) and an
  * out-of-contention row costs ONE comparison against the root.
  */
case class TopKAgg(
    scoreExpr: Expression,
    tagExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536,
    s"graft_topk k must be in [1, 65536], got $k")

  override def left: Expression = scoreExpr
  override def right: Expression = tagExpr

  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if ((scoreExpr.dataType == DoubleType ||
        scoreExpr.dataType == NullType) &&
      (tagExpr.dataType == StringType || tagExpr.dataType == NullType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("graft_topk expects (double score, string tag)," +
        s" got (${scoreExpr.dataType.sql}, ${tagExpr.dataType.sql})")

  override def createAggregationBuffer(): TopKAgg.Heap =
    new TopKAgg.Heap(k)

  override def update(h: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = scoreExpr.eval(input)
    val t = tagExpr.eval(input)
    if (s != null && t != null)
      // clone(): eval may hand back a pointer into a reused row buffer
      h.offer(s.asInstanceOf[Double], t.asInstanceOf[UTF8String].clone())
    h
  }

  override def merge(a: TopKAgg.Heap, b: TopKAgg.Heap): TopKAgg.Heap = {
    b.foreachUnordered((s, t) => a.offer(s, t))
    a
  }

  override def eval(h: TopKAgg.Heap): Any = {
    val sorted = h.drainSorted()
    new GenericArrayData(sorted.map { case (s, t) =>
      new GenericInternalRow(Array[Any](s, t))
    })
  }

  override def serialize(h: TopKAgg.Heap): Array[Byte] = {
    val elems = new mutable.ArrayBuffer[(Double, Array[Byte])](h.size)
    h.foreachUnordered((s, t) => elems += ((s, t.getBytes)))
    val bb = ByteBuffer.allocate(
      4 + elems.iterator.map(e => 12 + e._2.length).sum)
    bb.putInt(elems.length)
    elems.foreach { case (s, tb) =>
      bb.putDouble(s); bb.putInt(tb.length); bb.put(tb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKAgg.Heap(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      h.offer(s, UTF8String.fromBytes(tb))
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKAgg =
    copy(scoreExpr = l, tagExpr = r)
}

object TopKAgg {

  /** k-bounded binary min-heap on (score ASC, tag DESC): the root is
    * the WEAKEST element under the result order (score DESC, tag ASC),
    * so a stronger arrival replaces the root in O(log k) and a weaker
    * one is rejected after one root comparison. Doubles compare via
    * `java.lang.Double.compare` (a total order — no NaN surprises);
    * tags via `UTF8String.binaryCompare` (UTF-8 byte = code-point
    * order, the engine/oracle string order). */
  final class Heap(k: Int) {
    private val scores = new Array[Double](k)
    private val tags = new Array[UTF8String](k)
    private var n = 0

    def size: Int = n

    /** a strictly weaker than b under the RESULT order? (weaker =
      * smaller score, or equal score and binary-later tag) */
    private def weaker(sa: Double, ta: UTF8String, sb: Double,
        tb: UTF8String): Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      c < 0 || (c == 0 && ta.binaryCompare(tb) > 0)
    }

    def offer(s: Double, t: UTF8String): Unit = {
      if (n < k) {
        // grow: sift the new leaf up while weaker than its parent
        var i = n
        n += 1
        scores(i) = s; tags(i) = t
        while (i > 0) {
          val p = (i - 1) >> 1
          if (weaker(scores(i), tags(i), scores(p), tags(p))) {
            swap(i, p); i = p
          } else return
        }
      } else if (weaker(scores(0), tags(0), s, t)) {
        // replace the weakest survivor, sift the root down
        scores(0) = s; tags(0) = t
        var i = 0
        while (true) {
          val l = 2 * i + 1
          val r = l + 1
          var w = i
          if (l < n && weaker(scores(l), tags(l), scores(w), tags(w))) w = l
          if (r < n && weaker(scores(r), tags(r), scores(w), tags(w))) w = r
          if (w == i) return
          swap(i, w); i = w
        }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val s = scores(i); scores(i) = scores(j); scores(j) = s
      val t = tags(i); tags(i) = tags(j); tags(j) = t
    }

    def foreachUnordered(f: (Double, UTF8String) => Unit): Unit = {
      var i = 0
      while (i < n) { f(scores(i), tags(i)); i += 1 }
    }

    /** Elements strong→weak (score DESC, tag ASC) — the result order. */
    def drainSorted(): Array[(Double, UTF8String)] = {
      val out = new Array[(Double, UTF8String)](n)
      var i = 0
      while (i < n) { out(i) = (scores(i), tags(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, UTF8String), b: (Double, UTF8String)) => {
          val c = java.lang.Double.compare(b._1, a._1)
          c < 0 || (c == 0 && a._2.binaryCompare(b._2) < 0)
        })
      out
    }
  }
}
