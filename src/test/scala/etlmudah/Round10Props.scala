package etlmudah

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** ScalaCheck properties for the round-10 operator family: each
  * distributed operator must equal a plain-Scala serial replay of its
  * DEFINITION on arbitrary inputs — the DedupProps/BpeProps discipline
  * applied to IVM merges, BFS depths, and lattice quantiles. */
object Round10Props extends Properties("Round10") {

  private lazy val spark = SparkTestSession.spark

  // ---- mergeAggState: merged == from-scratch on clean groups --------

  private val deltaGen: Gen[List[(String, Int, Int)]] =
    Gen.listOfN(18, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.chooseNum(1, 9)
      op <- Gen.oneOf(1, 1, 1, -1)      // inserts dominate
    } yield (k, v, op))

  private val baseGen: Gen[List[(String, Int)]] =
    Gen.listOfN(12, for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(1, 9)
    } yield (k, v))

  property("mergeAggState == scratch recompute wherever it does not flag a rescan") =
    forAll(baseGen, deltaGen) { (base, delta0) =>
      import spark.implicits._
      // a retraction is only a CONTRACT-legal delta if the row exists:
      // keep -1 ops only when base (plus earlier inserts) contains one
      val multiset = scala.collection.mutable.Map[(String, Int), Int]()
      base.foreach(r => multiset(r) = multiset.getOrElse(r, 0) + 1)
      val delta = delta0.filter { case (k, v, op) =>
        if (op > 0) { multiset((k, v)) = multiset.getOrElse((k, v), 0) + 1; true }
        else if (multiset.getOrElse((k, v), 0) > 0) {
          multiset((k, v)) -= 1; true
        } else false
      }
      val st = load.Upsert.aggState(base.toDF("k", "x"), Seq("k"),
        col("x").cast("decimal(18,2)"))
      val merged = load.Upsert.mergeAggState(st,
          delta.toDF("k", "x", "op"), Seq("k"),
          col("x").cast("decimal(18,2)"), col("op"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDecimal(2).doubleValue,
            Option(r.getDecimal(3)).map(_.doubleValue),
            Option(r.getDecimal(4)).map(_.doubleValue),
            r.getBoolean(5)))).toMap
      // serial truth: base + inserts - deletes, per key
      val rows = scala.collection.mutable.ArrayBuffer[(String, Int)]()
      rows ++= base
      delta.foreach { case (k, v, op) =>
        if (op > 0) rows += ((k, v))
        else rows -= ((k, v))
      }
      val truth = rows.groupBy(_._1).map { case (k, rs) =>
        val vs = rs.map(_._2.toDouble)
        k -> ((vs.size.toLong, vs.sum, vs.min, vs.max))
      }
      // key sets agree; counts and sums agree EVERYWHERE; min/max
      // agree wherever the merge did not flag a rescan
      merged.keySet == truth.keySet && merged.forall { case (k, m) =>
        val t = truth(k)
        m._1 == t._1 && m._2 == t._2 &&
          (m._5 || (m._3.contains(t._3) && m._4.contains(t._4)))
      }
    }

  // ---- bfsDepths: serial BFS replay ---------------------------------

  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(20, for {
      s <- Gen.chooseNum(0L, 9L)
      d <- Gen.chooseNum(0L, 9L)
    } yield (s, d))

  property("bfsDepths == a serial BFS for any small graph and seed set") =
    forAll(edgesGen, Gen.nonEmptyListOf(Gen.chooseNum(0L, 9L)),
      Gen.chooseNum(0, 4)) { (edges, seeds, hops) =>
      import spark.implicits._
      val got = graph.Centrality.bfsDepths(
          edges.toDF("src", "dst"), seeds.toDF("node"), hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // serial truth
      val adj = edges.distinct.groupBy(_._1).map { case (s, es) =>
        s -> es.map(_._2).toSet
      }
      var depth = seeds.distinct.map(_ -> 0L).toMap
      var frontier = seeds.distinct.toSet
      (1 to hops).foreach { h =>
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(depth.keySet)
        depth = depth ++ next.map(_ -> h.toLong)
        frontier = next
      }
      got == depth
    }

  // ---- latticeQuantiles: rank definition + error bound --------------

  private val valsGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0, 400).map(_ / 4.0))

  property("latticeQuantiles matches the serial rank pick; error <= width vs the exact quantile") =
    forAll(valsGen, Gen.oneOf(5.0, 10.0, 25.0),
      Gen.oneOf(100, 500, 900)) { (vs, width, q) =>
      import spark.implicits._
      val r = scale.Sketches.latticeQuantiles(
          vs.map(("g", _)).toDF("k", "v"), "k", col("v"), width, Seq(q))
        .collect()(0)
      val buckets = vs.map(v => math.floor(v / width).toLong).sorted
      val n = buckets.size
      val thresh = (n * q + 999) / 1000
      val serial = buckets(thresh - 1)       // first cum >= thresh
      val exact = vs.sorted.apply(thresh - 1)
      r.getAs[Long](s"q${q}_bucket") == serial &&
        math.abs(r.getAs[Double](s"q${q}_est") - exact) <= width
    }
}
