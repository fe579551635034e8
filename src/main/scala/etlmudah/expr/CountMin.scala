package etlmudah.expr

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** COUNT-MIN SKETCH aggregate (`graft_cms(key[, depth[, width]])`) —
  * the fixed-memory frequency summary of Cormode & Muthukrishnan
  * ("An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 55, 2005): a depth x width grid of
  * counters; each key increments one counter per row (bucket chosen
  * by an independent hash per row), and a key's frequency estimate is
  * the MIN over its depth counters — an overestimate by construction,
  * never an under-estimate, with error <= 2N/width at probability
  * 1 - 2^-depth.
  *
  * Unlike Spark's built-in `count_min_sketch` (whose bucket layout
  * rides an engine-internal hash no other system reproduces), the
  * bucket hash here is the repo's PORTABLE md5-lane discipline
  * (`Dedup.scala` minhash family, `Writers.manifestOfAssigned`
  * checksum): row d of the grid buckets a key by hex lane d of
  * md5(key) — `conv(substr(md5(key), 8d+1, 8), 16, 10) % width` — so
  * a SQL engine replays every counter AND every estimate exactly,
  * byte for byte. That makes the sketch itself oracle-checkable, not
  * merely spec-plausible. depth <= 4 (md5 has four 32-bit lanes).
  *
  * The aggregation buffer is one long[depth * width] (row-major);
  * merge is elementwise add, so partial aggregation applies: each
  * executor folds its partition into a local grid and the shuffle
  * moves ONE grid per partition, never the keys — the whole point of
  * a sketch at 100 TB. Result type: array<bigint> of depth*width.
  *
  * Mirrors the reference's frequency-table/top-K analytics tier
  * (analysis.py value_counts surface) at the scale where exact
  * per-key state no longer fits.
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 256,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 4,
    s"graft_cms depth must be in [1, 4] (md5 has 4 32-bit lanes), got $depth")
  require(width >= 1 && width.toLong * depth <= (1 << 22),
    s"graft_cms grid depth*width must stay <= 2^22 counters, got $depth x $width")

  override def prettyName: String = "graft_cms"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects a string key, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = CountMinSketchAgg.md5Hex(v.toString)
      var d = 0
      while (d < depth) {
        buffer(d * width + CountMinSketchAgg.lane(hex, d, width)) += 1L
        d += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

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

  override def withNewMutableAggBufferOffset(n: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CountMinSketchAgg =
    copy(child = c)
}

object CountMinSketchAgg {

  /** Lowercase md5 hex of the key's UTF-8 bytes — identical to Spark's
    * `md5(cast(key as binary))` and DuckDB's `md5(key)`, which is what
    * lets the probe side and the oracle reproduce the grid. */
  def md5Hex(key: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(key.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xFF}%02x"))
    sb.toString
  }

  /** Bucket of hex lane `d` (8 hex chars = 32 bits, non-negative in a
    * Long) modulo `width` — the JVM twin of the SQL probe
    * `conv(substr(md5(key), 8d+1, 8), 16, 10) % width`. */
  def lane(hex: String, d: Int, width: Int): Int =
    (java.lang.Long.parseLong(hex.substring(8 * d, 8 * d + 8), 16) %
      width).toInt
}
