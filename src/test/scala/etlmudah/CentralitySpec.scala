package etlmudah.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CentralitySpec extends SparkSpec {

  private val SCALE = 1000000000000L

  /** Serial replay of the EXACT integer recurrence pageRankInt
    * documents — Long `/` truncates like Spark's `div` on these
    * non-negative operands, so any divergence is an engine bug, not
    * float noise. */
  private def serialPageRank(edges: Seq[(Long, Long, Long)],
                             iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> SCALE / n).toMap
    val base = (15L * SCALE) / (100L * n)
    (0 until iters).foreach { _ =>
      val c = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => (r(s) * w) / outw(s) }.sum
      }
      r = nodes.map(v => v -> (base + (85L * c.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Long)], iters: Int) = {
    import spark.implicits._
    Centrality.pageRankInt(edges.toDF("src", "dst", "weight"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRankInt matches the serial integer replay on a directed graph") {
    // 1 -> 2 -> 3 -> 1 plus a 4 -> 2 feeder and a weighted 1 -> 3 chord:
    // cycles, a dangling-ish feeder, and unequal out-weights
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L),
      (4L, 2L, 5L), (1L, 3L, 3L))
    (1 to 4).foreach { it =>
      assert(run(edges, it) == serialPageRank(edges, it), s"iters=$it")
    }
  }

  test("pageRankInt ranks the hub of a star highest; spokes tie") {
    val spokes = (2L to 9L)
    val edges = spokes.flatMap(s => Seq((s, 1L, 1L), (1L, s, 1L)))
    val out = run(edges, 3)
    assert(out(1L) > out(2L), s"hub must outrank spokes: $out")
    assert(spokes.map(out).toSet.size == 1, "spokes must tie exactly")
    assert(out == serialPageRank(edges, 3))
  }

  test("pageRankInt: dangling nodes keep the teleport base; empty edges yield empty ranks") {
    // 2 has no out-edges: it receives from 1 but leaks its damped mass
    val edges = Seq((1L, 2L, 1L))
    val out = run(edges, 2)
    assert(out == serialPageRank(edges, 2))
    assert(out(1L) == (15L * SCALE) / (100L * 2L),
      "a node with no in-edges holds exactly the teleport base")
    import spark.implicits._
    val empty = Centrality.pageRankInt(
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "weight"))
    assert(empty.count() == 0)
  }

  test("cooccurrenceEdges: symmetric weighted pairs, no self-loops") {
    import spark.implicits._
    val items = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L), (11L, 2L),
      (12L, 7L)) // singleton group 12 yields no edges
    val out = Centrality.cooccurrenceEdges(
        items.toDF("g", "item"), "g", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 2L), (2L, 1L, 2L), (1L, 3L, 1L),
      (3L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L)))
  }

  private def triStats(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Centrality.triangleStats(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  /** Serial triangle replay: brute-force closed wedges over the
    * canonical undirected edge set. */
  private def serialTriangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    val es = und.toSet
    val nodes = (und.map(_._1) ++ und.map(_._2)).distinct
    val deg = nodes.map(n => n -> und.count(e => e._1 == n || e._2 == n).toLong).toMap
    val tri = (for {
      Seq(x, y, z) <- nodes.sorted.combinations(3)
      if es((x, y)) && es((x, z)) && es((y, z))
    } yield Seq(x, y, z)).toSeq.flatten
      .groupBy(identity).map { case (n, ts) => n -> ts.size.toLong }
    nodes.map(n => n -> (deg(n), tri.getOrElse(n, 0L))).toMap
  }

  test("triangleStats matches a brute-force replay; direction/duplicate input canonicalized") {
    // K4 on 1-4 (every node in 3 triangles) + a pendant 5 + an isolated
    // edge 6-7; edges fed in MIXED direction with a duplicate
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (3L, 2L),
      (2L, 4L), (4L, 3L), (4L, 5L), (6L, 7L))
    val got = triStats(edges)
    assert(got == serialTriangles(edges), s"got $got")
    assert(got(1L) == ((3L, 3L)) && got(5L) == ((1L, 0L)) && got(6L) == ((1L, 0L)))
  }

  test("triangleStats: skewed star closes no triangles; adding one rim edge closes exactly one") {
    val star = (2L to 40L).map(s => (1L, s))
    assert(triStats(star).values.forall(_._2 == 0L))
    val withRim = star :+ ((2L, 3L))
    val got = triStats(withRim)
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L && got(3L)._2 == 1L &&
      got(4L)._2 == 0L)
    assert(got == serialTriangles(withRim))
  }

  test("cooccurrencePairs: u<v canonical, weight threshold applied") {
    import spark.implicits._
    val items = Seq((10L, 2L), (10L, 1L), (11L, 1L), (11L, 2L), (11L, 3L))
    val out = Centrality.cooccurrencePairs(items.toDF("g", "item"), "g", "item",
        minWeight = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 2L)), s"got $out")
  }

  test("q218 shape on sf0.001: ranks positive, ordered, one row per co-purchased part") {
    val li = etlmudah.Tables.lineitem(spark, sf0001)
    val edges = Centrality.cooccurrenceEdges(li, "l_orderkey", "l_partkey")
    val pr = Centrality.pageRankInt(edges, iters = 3).collect()
    val nodes = edges.select("src").distinct().count()
    assert(pr.length == nodes && pr.forall(_.getLong(1) > 0L))
    val ranks = pr.map(_.getLong(1)).toSeq
    assert(ranks == ranks.sortBy(-_), "output must be rank-descending")
  }
}
