package etlmudah.scale

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** ScalaCheck properties for deterministic splitting: any ascending
  * bounds list ending at 1.0 partitions every keyed row into exactly
  * one split, and per-key assignment is invariant to which other keys
  * are present. */
object SamplingProps extends Properties("Sampling") {

  private lazy val spark = SparkTestSession.spark

  private val boundsGen: Gen[Seq[(String, Double)]] = for {
    n <- Gen.choose(1, 4)
    cuts <- Gen.listOfN(n, Gen.choose(0.05, 0.95))
  } yield {
    val asc = cuts.distinct.sorted
    (asc :+ 1.0).zipWithIndex.map { case (b, i) => (s"s$i", b) }
  }

  private val keysGen = Gen.listOfN(30, Gen.choose(0L, 1000000L)).map(_.distinct)

  property("totality: every key gets exactly one label from the bounds") =
    forAll(boundsGen, keysGen) { (bounds, keys) =>
      import spark.implicits._
      keys.isEmpty || {
        val labeled = Sampling.hashSplit(keys.toDF("k"), "k", bounds)
          .collect().map(r => r.getLong(0) -> r.getString(1))
        labeled.length == keys.length &&
          labeled.forall { case (_, s) => bounds.exists(_._1 == s) }
      }
    }

  property("stability: a key's split never depends on the other keys present") =
    forAll(boundsGen, keysGen) { (bounds, keys) =>
      import spark.implicits._
      keys.sizeIs < 2 || {
        val all = Sampling.hashSplit(keys.toDF("k"), "k", bounds)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val half = keys.take(keys.size / 2)
        val sub = Sampling.hashSplit(half.toDF("k"), "k", bounds)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        sub.forall { case (k, s) => all(k) == s }
      }
    }
}
