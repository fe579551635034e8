package etlmudah.load

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** ScalaCheck property suite for the merge operator (SURVEY §5.3):
  * idempotence, map-union equivalence, and key uniqueness hold for
  * arbitrary generated base/batch pairs, not just hand-picked cases. */
object UpsertProps extends Properties("Upsert") {

  private lazy val spark = SparkTestSession.spark

  private val keyedRows: Gen[Map[Long, String]] = for {
    n <- Gen.choose(0, 25)
    keys <- Gen.listOfN(n, Gen.choose(0L, 12L))
    values <- Gen.listOfN(n, Gen.alphaStr.map(_.take(6)))
  } yield keys.zip(values).toMap

  private def frame(rows: Map[Long, String], ts: Long) = {
    import spark.implicits._
    rows.toSeq.map { case (k, v) => (k, v, ts) }.toDF("id", "payload", "batch_ts")
  }

  private def run(base: Map[Long, String], batch: Map[Long, String]): Map[Long, String] =
    Upsert.upsert(frame(base, 1L), frame(batch, 2L), Seq("id"),
        Seq(col("batch_ts").desc))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  property("merge equals map union (batch wins)") =
    forAll(keyedRows, keyedRows) { (base, batch) =>
      run(base, batch) == base ++ batch
    }

  property("idempotent: re-applying the batch is a no-op") =
    forAll(keyedRows, keyedRows) { (base, batch) =>
      val once = run(base, batch)
      run(once, batch) == once
    }

  property("keys unique after merge") =
    forAll(keyedRows, keyedRows) { (base, batch) =>
      val out = Upsert.upsert(frame(base, 1L), frame(batch, 2L), Seq("id"),
        Seq(col("batch_ts").desc))
      out.count() == out.select("id").distinct().count()
    }

  // ---- partial-column form: updateCols refresh, everything else is
  // preserved from the base row on matched keys ----

  private def frame2(rows: Map[Long, (String, String)], ts: Long) = {
    import spark.implicits._
    rows.toSeq.map { case (k, (p, e)) => (k, p, e, ts) }
      .toDF("id", "payload", "extra", "batch_ts")
  }

  private def runPartial(base: Map[Long, (String, String)],
                         batch: Map[Long, (String, String)]): Map[Long, (String, String)] =
    Upsert.upsert(frame2(base, 1L), frame2(batch, 2L), Seq("id"),
        Seq(col("batch_ts").desc), Seq("payload", "batch_ts"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap

  property("partial merge: updateCols take batch values, others keep base's") =
    forAll(keyedRows, keyedRows) { (b0, n0) =>
      val base = b0.map { case (k, v) => k -> (v, s"base-extra-$k") }
      // the batch carries a poisoned `extra` that must never survive a match
      val batch = n0.map { case (k, v) => k -> (v + "-v2", "CLOBBER") }
      val expect = base.map { case (k, (p, e)) =>
        k -> (batch.get(k).map(_._1).getOrElse(p), e)
      } ++ (batch -- base.keySet)
      runPartial(base, batch) == expect
    }

  property("partial merge idempotent: re-applying the batch is a no-op") =
    forAll(keyedRows, keyedRows) { (b0, n0) =>
      val base = b0.map { case (k, v) => k -> (v, s"e$k") }
      val batch = n0.map { case (k, v) => k -> (v + "N", "X") }
      val once = runPartial(base, batch)
      runPartial(once, batch) == once
    }
}
