package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Linearity evidence for the text near-dup family: times the full
  * MinHash-LSH pipeline (signature -> banded candidates -> exact-Jaccard
  * verify) at doubling corpus sizes of synthetic ~120-word documents with
  * a planted 20% near-duplicate rate. The claim under test is the 100 TB
  * one — candidate generation is an equi-join on band keys, so cost grows
  * with n (x bucket occupancy), NOT n^2. One JSON line per size; results
  * committed in BENCHNOTES.md.
  *
  * Documents are generated columnar (seeded xxhash64 word picks over a
  * broadcast vocabulary — no driver-side text building): ids in the same
  * pair-group share their word seed and diverge in ~6% of positions, so
  * every even/odd id pair inside the planted fraction is a true near-dup.
  *
  *   runMain graft.tools.DedupScalingBench [n1 n2 ...]
  */
object DedupScalingBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(20000, 40000, 80000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = (0 until 5000).map(i => s"w$i")
    val words = 120

    def corpus(n: Int) = {
      // planted near-dups: ids with id%10 < 2 share a word seed with their
      // even/odd partner; ~6% of positions differ (parity-dependent pick)
      val base = spark.range(n.toLong).toDF("doc_id")
        .withColumn("__g",
          when(pmod(col("doc_id"), lit(10)) < 2, col("doc_id") - pmod(col("doc_id"), lit(2)))
            .otherwise(col("doc_id")))
      val wordAt = (pos: Column) => {
        val divergent = pmod(xxhash64(col("__g"), pos), lit(17)) === 0
        val pick = when(divergent,
          pmod(xxhash64(col("doc_id"), pos, lit(1)), lit(vocab.length)))
          .otherwise(pmod(xxhash64(col("__g"), pos, lit(2)), lit(vocab.length)))
        element_at(lit(vocab.toArray), (pick + 1).cast("int"))
      }
      base.withColumn("text",
        concat_ws(" ", (0 until words).map(p => wordAt(lit(p))): _*))
        .drop("__g")
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    sizes.foreach { n =>
      val df = corpus(n).cache()
      df.count() // materialize generation outside the timed region
      var pairs = 0L
      val sec = time {
        pairs = Dedup.nearDuplicatePairs(df, "text", "doc_id", threshold = 0.5).count()
      }
      // Locale.ROOT: the default-locale f"" interpolator would print a
      // decimal comma on de_DE-style JVMs — invalid JSON
      println(String.format(java.util.Locale.ROOT,
        """{"n":%d, "near_dup_pairs":%d, "sec":%.2f}""",
        Int.box(n), Long.box(pairs), Double.box(sec)))
      df.unpersist()
    }
    spark.stop()
  }
}
