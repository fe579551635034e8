package etlmudah

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Second round-10 property batch: HITS on arbitrary graphs, the
  * checksum-diff iff-equality contract, and decayed-count replay. */
object Round10Props2 extends Properties("Round10b") {

  private lazy val spark = SparkTestSession.spark

  // ---- hitsInt: serial integer replay over random weighted graphs ---

  private def serialHits(edges: Seq[(Long, Long, Long)], iters: Int,
                         scale: Long): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    def renorm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = if (m.isEmpty) 0L else m.values.max
      nodes.map(v => v ->
        (if (mx > 0) m.getOrElse(v, 0L) * scale / mx else 0L)).toMap
    }
    var hub = nodes.map(_ -> scale).toMap
    var auth = Map.empty[Long, Long]
    (0 until iters).foreach { _ =>
      auth = renorm(edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => hub(e._1) * e._3).sum })
      hub = renorm(edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => auth(e._2) * e._3).sum })
    }
    nodes.map(v => v -> ((hub(v), auth(v)))).toMap
  }

  private val hitsEdgesGen: Gen[List[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(0L, 7L)
      d <- Gen.chooseNum(0L, 7L)
      w <- Gen.chooseNum(1L, 5L)
    } yield (s, d, w)).map(_.take(15))

  property("hitsInt == the serial integer replay on any weighted digraph") =
    forAll(hitsEdgesGen, Gen.chooseNum(1, 3)) { (edges0, iters) =>
      import spark.implicits._
      // collapse parallel edges (the miner emits one weighted edge per
      // pair; parallel edges would double-count in the serial fold)
      val edges = edges0.groupBy(e => (e._1, e._2))
        .map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toList
      val got = graph.Centrality.hitsInt(
          edges.toDF("src", "dst", "weight"), iters)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      got == serialHits(edges, iters, 1000000L)
    }

  // ---- checksumDiff: empty IFF equal as multisets --------------------

  private val tableGen: Gen[List[(Long, String)]] =
    Gen.listOfN(12, for {
      id <- Gen.chooseNum(0L, 6L)
      v <- Gen.oneOf("x", "y", "z", "")
    } yield (id, v))

  property("checksumDiff is empty iff the tables are equal as multisets") =
    forAll(tableGen, tableGen) { (a, b) =>
      import spark.implicits._
      val diff = quality.Validate.checksumDiff(
        a.toDF("id", "v"), b.toDF("id", "v"), Seq("id", "v"), 4)
      val equalMultisets =
        a.groupBy(identity).view.mapValues(_.size).toMap ==
          b.groupBy(identity).view.mapValues(_.size).toMap
      (diff.count() == 0L) == equalMultisets
    }

  // ---- decayedCounts: serial shift replay ----------------------------

  private val eventsGen: Gen[List[(String, Long)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b")
      us <- Gen.chooseNum(0L, 2000L)
    } yield (k, us)).map(_.take(25))

  property("decayedCounts == the serial shift fold; future rows excluded") =
    forAll(eventsGen, Gen.chooseNum(1L, 300L),
      Gen.chooseNum(500L, 1500L)) { (rows, hl, asOf) =>
      import spark.implicits._
      val got = analytics.Analytics.decayedCounts(
          rows.toDF("k", "us")
            .withColumn("ts", timestamp_micros(col("us"))),
          "k", col("ts"), asOf, hl)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val truth = rows.filter(_._2 <= asOf).groupBy(_._1)
        .map { case (k, rs) =>
          k -> ((rs.size.toLong, rs.map { r =>
            val b = math.min((asOf - r._2) / hl, 62L).toInt
            (1L << 40) >> b
          }.sum))
        }
      got == truth
    }
}
