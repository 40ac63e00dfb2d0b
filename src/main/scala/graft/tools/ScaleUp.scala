package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N-fold scale-up of a driver testdata dir (default 10x:
  * sf0.1 -> sf1), used for the measured scaling point in BENCHNOTES.md.
  *
  * Each copy `i` is the sf0.1 data with every entity key shifted by
  * `i * (maxKey + 1)` so foreign keys stay consistent and key
  * cardinalities scale linearly. Dimension tables (region, nation) keep
  * one copy, like TPC-H. Two columns get a per-copy decorrelation so the
  * pair-finding operators scale the way real corpora do (10 independent
  * shards, not 10 literal clones whose cross-copy duplicates would blow
  * pair outputs up quadratically):
  *
  *  - `documents.text`: Caesar-shift of letters by `i`. Lengths, word
  *    shapes, repetition and within-copy near-dup structure are preserved
  *    exactly; shingle/minhash/simhash values across copies are unrelated.
  *  - `embeddings.embedding`: per-copy diagonal sign-flip D_i (sign from
  *    murmur3(dim, i)). D_i is orthogonal, so within-copy cosines are
  *    bit-preserved; cross-copy cosines decorrelate.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/testdata-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // the per-copy Caesar shift is i % 26: factor 27+ would give copy 26
    // the SAME shift as copy 0, i.e. literal cross-copy text clones — the
    // quadratic near-dup pair blowup the decorrelation exists to prevent
    require(factor >= 1 && factor <= 26,
      s"factor must be in [1, 26] (text decorrelation has 26 distinct shifts), got $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, factor)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).collect()(0).getLong(0) + 1L

    val custOff = off(rd("customer"), "c_custkey")
    val suppOff = off(rd("supplier"), "s_suppkey")
    val partOff = off(rd("part"), "p_partkey")
    val ordOff = off(rd("orders"), "o_orderkey")
    val evOff = off(rd("events"), "event_id")
    val userOff = off(rd("events"), "user_id")
    val docOff = off(rd("documents"), "doc_id")
    val vecOff = off(rd("embeddings"), "vec_id")

    // one select per copy, unioned: each copy is a map-side projection of
    // the same scan, so generation is a single shuffle-free write per table
    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionAll _)

    def shiftKeys(keysAndOffsets: (String, Long)*)(df: DataFrame, i: Int): DataFrame =
      keysAndOffsets.foldLeft(df) { case (d, (k, o)) =>
        d.withColumn(k, col(k) + lit(i * o))
      }

    val alphabet = ('a' to 'z').mkString + ('A' to 'Z').mkString
    def caesar(i: Int): (String, String) = {
      val s = i % 26
      val lower = ('a' to 'z').map(c => (('a' + (c - 'a' + s) % 26)).toChar).mkString
      val upper = ('A' to 'Z').map(c => (('A' + (c - 'A' + s) % 26)).toChar).mkString
      (alphabet, lower + upper)
    }

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"scaleup: $name -> $dst/$name.parquet")
    }

    write("region", rd("region"))
    write("nation", rd("nation"))
    write("customer", copies(rd("customer"))(shiftKeys("c_custkey" -> custOff)))
    write("supplier", copies(rd("supplier"))(shiftKeys("s_suppkey" -> suppOff)))
    write("part", copies(rd("part"))(shiftKeys("p_partkey" -> partOff)))
    write("orders", copies(rd("orders"))(
      shiftKeys("o_orderkey" -> ordOff, "o_custkey" -> custOff)))
    write("lineitem", copies(rd("lineitem"))(shiftKeys(
      "l_orderkey" -> ordOff, "l_partkey" -> partOff, "l_suppkey" -> suppOff)))
    write("events", copies(rd("events"))(
      shiftKeys("event_id" -> evOff, "user_id" -> userOff)))
    write("documents", copies(rd("documents")) { (df, i) =>
      val (from, to) = caesar(i)
      shiftKeys("doc_id" -> docOff)(df, i)
        .withColumn("text", translate(col("text"), from, to))
    })
    write("embeddings", copies(rd("embeddings")) { (df, i) =>
      // generation-only HOF: interpreted eval is fine off the engine's hot
      // path, and murmur3 hash(dim, copy) is deterministic across runs
      shiftKeys("vec_id" -> vecOff)(df, i)
        .withColumn("embedding", transform(col("embedding"),
          (x, idx) => when(pmod(hash(idx, lit(i)), lit(2)) === 1, -x).otherwise(x)))
    })
  }
}
