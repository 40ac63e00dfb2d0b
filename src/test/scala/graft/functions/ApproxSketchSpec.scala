package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Error-bound checks for Spark's built-in approximate sketches — the
  * documented scale paths where the exact operators (q42 heavy hitters,
  * distinct counts, q48 percentiles) stop being affordable: at 100 TB a
  * per-key exact count is a full shuffle, while CMS/HLL are one map-side
  * pass + tiny merge. These specs pin the error contracts the engine
  * relies on (CMS never under-counts; HLL relative error ~ 1.04/sqrt(2^p));
  * an approx_percentile bound lives in GroupPercentilesSpec.
  */
class ApproxSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tokens = {
    val rng = new scala.util.Random(13)
    // zipf-ish: token k has frequency ~ 4000/k
    (1 to 40).flatMap(k => Seq.fill(4000 / k)(s"tok$k"))
      .map(t => (t, rng.nextInt()))
  }

  test("count_min_sketch estimates are one-sided: never below the true count") {
    val df = tokens.toDF("term", "junk")
    val sketchBytes = df.agg(
      count_min_sketch($"term", lit(0.001), lit(0.99), lit(42)).as("cms"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val truth = tokens.groupBy(_._1).map { case (t, xs) => t -> xs.size.toLong }
    truth.foreach { case (t, c) =>
      val est = cms.estimateCount(t)
      assert(est >= c, s"CMS under-counted $t: $est < $c")
      // eps = 0.001 of the stream length bounds the overcount w.h.p.
      assert(est <= c + math.ceil(0.001 * tokens.size).toLong + 1,
        s"CMS overcount for $t beyond eps*N: $est vs $c")
    }
  }

  test("approx_count_distinct lands within the HLL relative-error bound") {
    val df = (0 until 100000).map(i => s"id-$i").toDF("k")
    val exact = 100000.0
    // rsd 0.01 -> assert a generous 5-sigma envelope, deterministic seed
    val est = df.agg(approx_count_distinct($"k", 0.01)).head().getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.05,
      s"HLL estimate $est strayed ${math.abs(est - exact) / exact} from $exact")
  }
}
