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

  private val sizedGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    keys <- Gen.listOfN(n, Gen.choose(0L, 1000000L)).map(_.distinct)
    sizes <- Gen.listOfN(keys.size, Gen.choose(0L, 5000L))
  } yield keys.zip(sizes)

  property("shardAssign: distributed prefix sum == serial replay for any sizes/budget/buckets") =
    forAll(sizedGen, Gen.choose(1L, 10000L), Gen.choose(1, 9)) {
      (rows, budget, buckets) =>
        import spark.implicits._
        rows.isEmpty || {
          val got = Sampling.shardAssign(rows.toDF("k", "sz"), "k", "sz",
              budget, buckets)
            .select("k", "shard").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          var cum = 0L
          val expect = rows.sortBy(_._1).map { case (k, sz) =>
            val shard = cum / budget; cum += sz; k -> shard
          }.toMap
          got == expect
        }
    }

  property("kFold: every key lands in [0, k); assignment is key-pure") =
    forAll(keysGen, Gen.choose(2, 10)) { (keys, k) =>
      import spark.implicits._
      keys.isEmpty || {
        val all = Sampling.kFold(keys.toDF("key"), "key", k)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val sub = Sampling.kFold(keys.take(keys.size / 2).toDF("key"),
          "key", k).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        all.values.forall(f => f >= 0 && f < k) &&
          sub.forall { case (key, f) => all(key) == f }
      }
    }
}
