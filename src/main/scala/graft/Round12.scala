package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import etlmudah.Tables

/** Round-12 registry tier — appended to [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (per-round registry split, the Round11
  * seam). Same contract: every query ends in an explicit orderBy with
  * full tie-breaks, timestamps leave as epoch micros, counts/ranks
  * cast BIGINT on both sides, sums ride a DECIMAL/BIGINT lattice with
  * one closing double op per group. */
object Round12 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // FULL coreness decomposition (Batagelj–Zaveršnik via the iterated
    // Seidman ladder) of the weight≥2 co-purchase graph: core number
    // per node — the production hub-guard readout beside q313's tail
    // index (q309 answers ONE k; this answers all of them, and
    // max(coreness) is the graph's degeneracy). Non-vacuous at every
    // SF by construction: every node of the simple graph has
    // coreness ≥ 1. The oracle replays the whole ladder — 20 levels ×
    // 16 peel rounds each, each level starting from the previous
    // level's fixpoint — and takes max(level) per surviving node.
    "q336_coreness" -> ((s, dir) =>
      etlmudah.graph.Centrality.coreness(
        SparkEntry.stagedCoEdges(s, dir)
          .filter(col("src") < col("dst") && col("weight") >= 2L)
          .select(col("src").as("u"), col("dst").as("v"))))
  )

  def oracleSql: Map[String, String] = Map(

    // coreness ladder unrolled level by level, round by round (the
    // q309 step-replay discipline; AS MATERIALIZED because each alive
    // set is referenced twice per round). 20 levels × 16 rounds
    // covers the measured worst case (sf0.001: degeneracy 16, deepest
    // level drains in 13 rounds); extra rounds/levels are no-ops on
    // an already-fixed set.
    "q336_coreness" -> {
      val R = 16
      def round(k: Int, i: Int) = {
        val p = if (k == 1 && i == 1) "a0"
                else if (i == 1) s"a${k - 1}_$R"
                else s"a${k}_${i - 1}"
        s"""d${k}_$i AS MATERIALIZED (
           |  SELECT s.src AS node, count(*) AS deg FROM sym s
           |  JOIN $p x ON x.node = s.src
           |  JOIN $p y ON y.node = s.dst GROUP BY 1),
           |a${k}_$i AS MATERIALIZED (SELECT node FROM d${k}_$i WHERE deg >= $k)""".stripMargin
      }
      val rounds = (for (k <- 1 to 20; i <- 1 to R) yield round(k, i))
        .mkString(",\n")
      val levels = (1 to 20)
        .map(k => s"SELECT node, $k AS k FROM a${k}_$R")
        .mkString("\n  UNION ALL ")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT a.l_partkey::BIGINT AS u, b.l_partkey::BIGINT AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |sym AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0
         |        UNION ALL SELECT v, u FROM e0),
         |a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
         |$rounds,
         |lev AS MATERIALIZED (
         |  $levels)
         |SELECT node, max(k)::BIGINT AS coreness
         |FROM lev GROUP BY node ORDER BY node""".stripMargin
    }
  )
}
