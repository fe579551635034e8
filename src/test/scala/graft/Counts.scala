package graft
object Counts {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"QUERIES=${q.size} ORACLES=${o.size}")
    println(s"ORPHAN_ORACLES=${(o -- q).toSeq.sorted.mkString(",")}")
    println(s"ROWS_ONLY=${(q -- o).toSeq.sorted.mkString(",")}")
  }
}
