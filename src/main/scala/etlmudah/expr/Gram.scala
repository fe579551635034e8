package etlmudah.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** EXACT second-moment (Gram) statistics of an embedding column on an
  * integer lattice (`graft_gram(vec, dims, scale)`) — the distributed
  * half of the engine's PCA tier ([[etlmudah.scale.Spectral]]).
  *
  * Each vector quantizes to q_k = HALF_UP(double(x_k) * scale) — away-
  * from-zero rounding, the same rule as SQL `round`, and exact in
  * double for power-of-two scales because float->double and *2^k are
  * both exact. The aggregate then folds, in one pass:
  *
  *   result[i*d + j]     = sum over rows of q_i * q_j   (d x d Gram)
  *   result[d*d + i]     = sum over rows of q_i          (column sums)
  *   result[d*d + d]     = row count
  *
  * everything a centered covariance needs (n*G_ij - s_i*s_j — the
  * standard identity, still exact integers), with NO floating point
  * anywhere: the result is invariant to partitioning and row order,
  * which is what lets a SQL oracle replay a distributed PCA bit for
  * bit (the integer-lattice PageRank discipline applied to spectra).
  *
  * Scale shape: the buffer is one long[d*d + d + 1] (d = 64 ->
  * 4,161 counters, 33 KB); partial aggregation folds each partition
  * locally and the exchange moves one buffer per partition — the
  * corpus never shuffles. The Gram loop runs the upper triangle and
  * mirrors at eval time.
  *
  * Overflow bound (documented dial, not a silent detonation): a Gram
  * cell grows as n * (scale * max|x|)^2, so with scale 1024 and unit-
  * bounded embeddings the fold is exact up to n ~ 2^42 rows; larger
  * corpora scale the lattice down or shard the aggregate (the same
  * trade dial as the exact percentile tiers). */
case class GramSumsAgg(
    child: Expression,
    dims: Int,
    scale: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dims >= 1 && dims <= 512, s"graft_gram dims out of range: $dims")
  require(scale >= 1, s"graft_gram scale must be positive: $scale")

  override def prettyName: String = "graft_gram"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType) || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gram expects array<float|double>, got ${child.dataType.sql}")

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dims * dims + dims + 1)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dims,
      s"graft_gram: vector of ${arr.numElements()} elements, expected $dims")
    val q = new Array[Long](dims)
    var i = 0
    while (i < dims) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = GramSumsAgg.quantize(x, scale)
      i += 1
    }
    i = 0
    while (i < dims) {
      val qi = q(i)
      buffer(dims * dims + i) += qi
      var j = i
      while (j < dims) {        // upper triangle; eval mirrors
        buffer(i * dims + j) += qi * q(j)
        j += 1
      }
      i += 1
    }
    buffer(dims * dims + dims) += 1L
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    val out = buffer.clone()
    var i = 0
    while (i < dims) {
      var j = i + 1
      while (j < dims) {
        out(j * dims + i) = out(i * dims + j)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): GramSumsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GramSumsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): GramSumsAgg =
    copy(child = c)
}

object GramSumsAgg {
  /** HALF_UP (away-from-zero) lattice quantization — the JVM twin of
    * SQL `CAST(round(CAST(x AS DOUBLE) * scale) AS BIGINT)` on both
    * Spark and DuckDB (both round halves away from zero). */
  def quantize(x: Double, scale: Int): Long =
    BigDecimal.valueOf(x * scale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue
}
