package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.similarity.{Pq, Similarity}

/** Measures PQ and IVF+PQ recall@k against brute-force L2 ground truth
  * on a clustered synthetic corpus (the ProbesRecallBench companion,
  * giving L80 a measured recall basis rather than an argument): flat
  * ADC over all codes isolates QUANTIZATION loss; IVF+PQ at increasing
  * nProbe adds ROUTING loss on top — the two knobs (m/ksub vs nProbe)
  * a production tune turns. One JSON line per configuration; results
  * committed in BENCHNOTES.md.
  *
  *   runMain graft.tools.PqRecallBench [n] [m] [ksub] [k]
  */
object PqRecallBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val ksub = args.lift(2).map(_.toInt).getOrElse(16)
    val k = args.lift(3).map(_.toInt).getOrElse(10)
    val nQueries = 50
    val dim = 64
    val nLists = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the ProbesRecallBench corpus shape: clustered, the regime where
    // coarse routing is hard (near neighbors straddle cell boundaries)
    val rng = new scala.util.Random(42)
    val centers = Array.fill(20, dim)(rng.nextGaussian())
    val rows = (0 until n).map { i =>
      val c = centers(rng.nextInt(centers.length))
      Row(i.toLong, (c.map(x => x + 0.3 * rng.nextGaussian()): Array[Double]).toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("v", ArrayType(DoubleType))))
    val corpus = spark.createDataFrame(spark.sparkContext.parallelize(rows, 32), schema)
      .cache()
    corpus.count()
    val queries = corpus.where(col("vec_id") < nQueries).cache()
    queries.count()

    def resultPairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force squared-L2 ground truth (driver-side: n x nQueries)
    val all = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val truth: Set[(Long, Long)] = all.filter(_._1 < nQueries).flatMap { case (qid, qv) =>
      all.filter(_._1 != qid)
        .map { case (id, v) =>
          var s = 0.0; var i = 0
          while (i < dim) { val d = v(i) - qv(i); s += d * d; i += 1 }
          (id, s)
        }
        .sortBy { case (id, d) => (d, id) }.take(k)
        .map { case (id, _) => (qid, id) }
    }.toSet

    val cbs = Pq.trainCodebooks(corpus, "vec_id", "v", dim, m, ksub)
    val flat = resultPairs(Pq.adcTopK(corpus, "vec_id", "v", queries, cbs, dim, k))
    println(s"""{"config":"flat_pq_m${m}_k$ksub", "recall":${"%.3f".formatLocal(
      java.util.Locale.ROOT, (flat & truth).size.toDouble / truth.size)}, "candidates":$n}""")

    val cent = Similarity.trainIvfCentroids(corpus, "vec_id", "v", dim, nLists = nLists)
    Seq(1, 2, 4, 8, nLists).foreach { nProbe =>
      val got = resultPairs(Pq.ivfAdcTopK(corpus, "vec_id", "v", queries,
        cent, cbs, dim, k, nProbe))
      println(s"""{"config":"ivfpq_m${m}_k${ksub}_probe$nProbe", "recall":${"%.3f".formatLocal(
        java.util.Locale.ROOT, (got & truth).size.toDouble / truth.size)}}""")
    }

    // a finer quantizer only sharpens the codes; the structural fix is
    // the refine step — ADC as candidate generator + exact rerank
    val fine = Pq.trainCodebooks(corpus, "vec_id", "v", dim, m = 16, ksub = 64)
    val fineFlat = resultPairs(Pq.adcTopK(corpus, "vec_id", "v", queries, fine, dim, k))
    println(s"""{"config":"flat_pq_m16_k64", "recall":${"%.3f".formatLocal(
      java.util.Locale.ROOT, (fineFlat & truth).size.toDouble / truth.size)}}""")
    Seq(50, 200, 1000).foreach { r =>
      val got = resultPairs(Pq.adcTopKRefined(corpus, "vec_id", "v", queries,
        cbs, dim, k, rerank = r))
      println(s"""{"config":"pq_m${m}_k${ksub}_refine$r", "recall":${"%.3f".formatLocal(
        java.util.Locale.ROOT, (got & truth).size.toDouble / truth.size)}}""")
    }

    // RESIDUAL encoding (FAISS IVFPQ proper): codes learned on and
    // assigned to v - centroid(cell), ADC tables per (query, probed
    // cell) from the query's own residual — the structural fix for
    // intra-cluster quantization collapse, same m/ksub budget
    val rcbs = Pq.trainResidualCodebooks(corpus, "vec_id", "v", dim, m,
      centroids = cent, ksub = ksub)
    Seq(1, 4, nLists).foreach { nProbe =>
      val got = resultPairs(Pq.ivfAdcTopKResidual(corpus, "vec_id", "v", queries,
        cent, rcbs, dim, k, nProbe))
      println(s"""{"config":"ivfpq_residual_m${m}_k${ksub}_probe$nProbe", "recall":${"%.3f".formatLocal(
        java.util.Locale.ROOT, (got & truth).size.toDouble / truth.size)}}""")
    }
    Seq(50, 200).foreach { r =>
      val got = resultPairs(Pq.ivfAdcTopKResidualRefined(corpus, "vec_id", "v", queries,
        cent, rcbs, dim, k, nProbe = 4, rerank = r))
      println(s"""{"config":"ivfpq_residual_m${m}_k${ksub}_probe4_refine$r", "recall":${"%.3f".formatLocal(
        java.util.Locale.ROOT, (got & truth).size.toDouble / truth.size)}}""")
    }
    spark.stop()
  }
}
