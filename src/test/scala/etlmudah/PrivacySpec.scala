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

  test("tClosenessReport: hand-computed TV distances incl. a class missing a sensitive value") {
    import spark.implicits._
    // global: x=5, y=3, z=2 over N=10
    // class 1 (n=6): x=4, y=2, z=0
    //   tv = 0.5*(|4/6-5/10| + |2/6-3/10| + |0-2/10|)
    //      = 0.5*(1/6 + 1/30 + 1/5) = 0.2
    // class 2 (n=4): x=1, y=1, z=2
    //   tv = 0.5*(|1/4-1/2| + |1/4-3/10| + |1/2-1/5|) = 0.3
    val df = (Seq.fill(4)((1, "x")) ++ Seq.fill(2)((1, "y")) ++
      Seq((2, "x"), (2, "y"), (2, "z"), (2, "z"))).toDF("cls", "s")
    val r = Privacy.tClosenessReport(df, Seq("cls"), "s").collect()
      .map(x => (x.getInt(0), x.getAs[Long]("class_size"),
        x.getAs[Double]("tv_distance"))).toSeq
    assert(r == Seq((1, 6L, 0.2), (2, 4L, 0.3)), r.toString)
  }

  test("tClosenessReport: identical mix everywhere -> 0; disjoint -> (N-n)/N") {
    import spark.implicits._
    val same = Seq((1, "x"), (1, "y"), (2, "x"), (2, "y")).toDF("cls", "s")
    assert(Privacy.tClosenessReport(same, Seq("cls"), "s").collect()
      .forall(_.getAs[Double]("tv_distance") == 0.0))
    // fully disjoint sensitive values: tv = 1 - n_c/N
    val disj = Seq((1, "x"), (1, "x"), (2, "y"), (2, "y"),
      (2, "y"), (2, "y")).toDF("cls", "s")
    val r = Privacy.tClosenessReport(disj, Seq("cls"), "s").collect()
      .map(x => (x.getInt(0), x.getAs[Double]("tv_distance"))).toMap
    assert(r == Map(1 -> (1.0 - 2.0 / 6), 2 -> (1.0 - 4.0 / 6))
      || r == Map(1 -> 0.666667, 2 -> 0.333333), r.toString)
  }
}
