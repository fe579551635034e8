package etlmudah.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DensitySpec extends SparkSpec {

  test("kdeAtGrid: density peaks at the mode and integrates to ~1") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(2000)(rnd.nextGaussian() * 10 + 100).toDF("x")
    val grid = (40 to 160 by 2).map(_.toDouble)
    val d = Density.kdeAtGrid(data, col("x"), bandwidth = 5.0, grid)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1))
    val peak = d.maxBy(_._2)._1
    assert(math.abs(peak - 100.0) <= 6.0)
    val integral = d.map(_._2).sum * 2.0   // trapezoid-ish, step 2
    assert(integral > 0.9 && integral < 1.1)
  }
}
