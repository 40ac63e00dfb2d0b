package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.similarity.Similarity

/** Measures the exact-vs-LSH cosine near-dup crossover (round-2 verdict
  * task #8): the exact all-pairs plan (q35's shape) is O(n^2) and wins at
  * tiny corpus sizes on fixed overhead; the bucketed LSH plan (q39's
  * shape, pairs must share a sign-sketch bucket) is linear in corpus size
  * times bucket occupancy. This driver times both at growing n on seeded
  * gaussian-mixture vectors (clustered, like real embedding corpora) and
  * prints one JSON line per (n, variant). Results are committed in
  * BENCHNOTES.md.
  *
  *   runMain graft.tools.CrossoverBench [n1 n2 ...]
  */
object CrossoverBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(500, 2000, 5000, 10000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dim = 64
    def corpus(n: Int) = {
      val rng = new scala.util.Random(42)
      // 20 cluster centers; points = center + noise so near-dup pairs exist
      val centers = Array.fill(20, dim)(rng.nextGaussian())
      val rows = (0 until n).map { i =>
        val c = centers(rng.nextInt(centers.length))
        Row(i.toLong, c.map(x => x + 0.3 * rng.nextGaussian()).toSeq)
      }
      val schema = StructType(Seq(
        StructField("vec_id", LongType), StructField("v", ArrayType(DoubleType))))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 32), schema)
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    sizes.foreach { n =>
      val df = corpus(n).cache()
      df.count() // materialize outside the timed region
      // q35 shape: exact all-pairs
      val exact = time {
        val a = df.alias("ea"); val b = df.alias("eb")
        a.join(b, col("ea.vec_id") < col("eb.vec_id"))
          .withColumn("cosine", Similarity.cosine(col("ea.v"), col("eb.v")))
          .where(col("cosine") >= 0.3)
          .write.format("noop").mode("overwrite").save()
      }
      // q39 shape: LSH-bucketed
      val lsh = time {
        Similarity.cosineNearDupPairs(df, "vec_id", "v", threshold = 0.3, dim = dim, numBits = 4)
          .write.format("noop").mode("overwrite").save()
      }
      println(s"""{"n":$n,"exact_sec":${math.round(exact * 100) / 100.0},"lsh_sec":${math.round(lsh * 100) / 100.0}}""")
      df.unpersist()
    }
    spark.stop()
  }
}
