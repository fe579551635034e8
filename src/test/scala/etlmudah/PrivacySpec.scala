package etlmudah.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  private lazy val people = {
    import spark.implicits._
    Seq(
      // class (10, "A"): 3 rows, 2 distinct sensitive values
      (10, "A", "x"), (10, "A", "x"), (10, "A", "y"),
      // class (10, "B"): 1 row -> a k=2 violation, l=1
      (10, "B", "x"),
      // class (20, "A"): 2 rows, 1 distinct sensitive value
      (20, "A", "z"), (20, "A", "z"),
      // class (20, "B"): 2 rows, 2 distinct
      (20, "B", "x"), (20, "B", "y")
    ).toDF("nat", "seg", "s")
  }

  test("kAnonymityReport: class-size histogram with worst l-diversity") {
    val r = Privacy.kAnonymityReport(people, Seq("nat", "seg"), "s")
      .collect()
      .map(x => (x.getAs[Long]("class_size"), x.getAs[Long]("n_classes"),
        x.getAs[Long]("n_rows"), x.getAs[Long]("min_l"))).toSeq
    assert(r == Seq((1L, 1L, 1L, 1L), (2L, 2L, 4L, 1L), (3L, 1L, 3L, 2L)))
  }

  test("kAnonymityReport: null QI values form their own class") {
    import spark.implicits._
    val df = Seq[(Option[Int], String, String)](
      (None, "A", "x"), (None, "A", "y"), (Some(1), "A", "x"))
      .toDF("nat", "seg", "s")
    val r = Privacy.kAnonymityReport(df, Seq("nat", "seg"), "s").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    // the two null-nat rows are ONE class of size 2; the other size 1
    assert(r == Seq((1L, 1L), (2L, 1L)))
  }
}
