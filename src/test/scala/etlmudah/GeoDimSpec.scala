package etlmudah.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoDimSpec extends SparkSpec {

  test("enrichWithCoords: aliases standardized, coords joined, unknowns kept") {
    import spark.implicits._
    val listings = Seq("kl", "Sabah", "penang", "somewhere else").toDF("location")
    val rows = GeoDim.enrichWithCoords(listings, "location")
      .select("location", "state", "lat").collect()
      .map(r => r.getString(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(rows("kl") == ("Kuala Lumpur", Some(3.14)))
    assert(rows("penang") == ("Pulau Pinang", Some(5.41)))
    assert(rows("Sabah") == ("Sabah", Some(5.98)))
    assert(rows("somewhere else") == ("somewhere else", None))   // left join keeps it
    assert(rows.size == 4)
  }

  test("enrichment join broadcasts the dimension") {
    import spark.implicits._
    val listings = Seq("kl").toDF("location")
    val plan = GeoDim.enrichWithCoords(listings, "location")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"))
  }
}
