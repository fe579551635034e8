package etlmudah.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 re-expressing the reference's ingest path (SURVEY §2.1
  * S1-S4) as a first-class Spark source:
  *
  *  - S1 offset pagination: each partition reader loops `fetchBatch`
  *    (page-size chunks) until a short page or the per-region cap,
  *    mirroring dags/dag.py:43-78,137-161.
  *  - S2 partitioned parallel extract: one InputPartition per region
  *    (dag.py:18-21,80-110) — Spark's task scheduler replaces the
  *    reference's ThreadPoolExecutor(3); parallelism = task slots.
  *  - S3 rate limiting: a JVM-global token gate enforcing a minimum gap
  *    between fetches (dag.py:27,30-41). Per-executor at cluster scale:
  *    cap concurrent tasks against the API via scheduling, not state.
  *  - S4 retry with exponential backoff on throttle errors
  *    (dag.py:24-26,55-77), capped attempts, deterministic simulated
  *    429s for testing via the `failEveryNPages` option.
  *
  * The remote API is simulated by a DETERMINISTIC generator (this
  * sandbox has no egress): every field is integer arithmetic on
  * (region, offset), so an oracle can reproduce the exact dataset with
  * SQL generate_series — the pagination/rate-limit/retry machinery is
  * real, the bytes are reproducible.
  *
  * Usage:
  *   spark.read.format("etlmudah.sources.PagedSource")
  *     .option("regions", 5).option("perRegion", 1000)
  *     .option("pageSize", 200).load()
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(new CaseInsensitiveStringMap(properties))
}

object PagedSource {
  val schema: StructType = StructType(Seq(
    StructField("listing_id", LongType, nullable = false),
    StructField("region_id", IntegerType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("mileage_min", LongType, nullable = false),
    StructField("mileage_max", LongType, nullable = false)))

  /** The simulated API row for (region, offset) — pure int arithmetic so
    * DuckDB generate_series can rebuild it exactly. */
  def row(region: Int, offset: Long): (Long, Int, String, Double, Long, Long) = {
    val id = region * 1000000L + offset
    val price = ((id * 9973L) % 1000000L) / 100.0
    val mmin = (id * 31L) % 200000L
    (id, region, s"listing-$id", price, mmin, mmin + id % 50000L)
  }

  /** S3: JVM-global minimum-gap gate (the reference's global lock). */
  private val lastFetch = new java.util.concurrent.atomic.AtomicLong(0L)
  def rateLimit(minGapMs: Long): Unit = {
    if (minGapMs <= 0) return
    var done = false
    while (!done) {
      val now = System.currentTimeMillis()
      val prev = lastFetch.get()
      if (now - prev >= minGapMs) done = lastFetch.compareAndSet(prev, now)
      else Thread.sleep(minGapMs - (now - prev))
    }
  }

  /** Counts simulated throttles that were retried (observable in tests). */
  val retriedThrottles = new java.util.concurrent.atomic.AtomicLong(0L)
}

final class SimulatedThrottleException(msg: String) extends RuntimeException(msg)

class PagedTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "paged_listings"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new PagedScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

class PagedScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder with Scan {
  private val regions = options.getInt("regions", 5)
  private val perRegion = options.getLong("perRegion", 1000L)
  private val pageSize = options.getInt("pageSize", 200)
  private val rateLimitMs = options.getLong("rateLimitMs", 0L)
  private val failEveryNPages = options.getInt("failEveryNPages", 0)

  override def build(): Scan = this
  override def readSchema(): StructType = PagedSource.schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      (0 until regions).map(r =>
        PagedPartition(r, perRegion, pageSize, rateLimitMs, failEveryNPages)
          : InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      (p: InputPartition) => new PagedReader(p.asInstanceOf[PagedPartition])
  }
}

case class PagedPartition(region: Int, perRegion: Long, pageSize: Int,
                          rateLimitMs: Long, failEveryNPages: Int)
  extends InputPartition

class PagedReader(p: PagedPartition) extends PartitionReader[InternalRow] {
  private var offset = 0L
  private var page: Array[(Long, Int, String, Double, Long, Long)] = Array.empty
  private var pageIdx = 0
  private var pageNo = 0
  private val failedOnce = scala.collection.mutable.Set.empty[Int]

  /** S1+S3+S4: one paginated fetch with rate limit and retry/backoff. */
  private def fetchBatch(): Unit = {
    val maxRetries = 5
    var attempt = 0
    var fetched: Option[Array[(Long, Int, String, Double, Long, Long)]] = None
    while (fetched.isEmpty) {
      try {
        PagedSource.rateLimit(p.rateLimitMs)
        // Deterministic simulated 429: first attempt at every Nth page.
        if (p.failEveryNPages > 0 && pageNo % p.failEveryNPages == 0 &&
            !failedOnce.contains(pageNo)) {
          failedOnce += pageNo
          throw new SimulatedThrottleException(s"429 region=${p.region} page=$pageNo")
        }
        val n = math.min(p.pageSize.toLong, p.perRegion - offset).toInt
        fetched = Some((0 until n).map(i =>
          PagedSource.row(p.region, offset + i)).toArray)
      } catch {
        case _: SimulatedThrottleException if attempt < maxRetries =>
          attempt += 1
          PagedSource.retriedThrottles.incrementAndGet()
          Thread.sleep(math.min(1L << attempt, 32L))   // exponential, capped
      }
    }
    page = fetched.get
    pageIdx = 0
    pageNo += 1
    offset += page.length
  }

  override def next(): Boolean = {
    if (pageIdx < page.length) return true
    if (offset >= p.perRegion) return false
    fetchBatch()
    pageIdx < page.length
  }

  override def get(): InternalRow = {
    val (id, region, title, price, mmin, mmax) = page(pageIdx)
    pageIdx += 1
    new GenericInternalRow(Array[Any](
      id, region, UTF8String.fromString(title), price, mmin, mmax))
  }

  override def close(): Unit = ()
}
