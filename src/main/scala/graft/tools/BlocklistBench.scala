package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Measures the point of L73: a K-word blocklist as ONE Aho-Corasick
  * pass vs the naive K chained `contains` columns (what a SQL user
  * writes without the kernel). Both count word-UNBOUNDED containment to
  * keep the comparison apples-to-apples (contains has no boundary
  * mode). K synthetic patterns guaranteed mostly-absent, so both sides
  * scan full texts.
  *
  *   runMain graft.tools.BlocklistBench [dir] [k1 k2 ...]
  */
object BlocklistBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val ks = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 100, 1000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).where(col("text").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    def time(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val v = body
      (v, (System.nanoTime() - t0) / 1e9)
    }

    ks.foreach { k =>
      // a few live patterns so the result is non-trivial, rest absent
      val pats = Seq("customer", "vector") ++ (0 until k - 2).map(i => s"zzblocked$i")
      val (acHits, acSec) = time {
        docs.select(TextFunctions.blocklistHits(col("text"), pats,
            wordBounded = false).as("h"))
          .agg(sum(col("h"))).collect()(0).getLong(0)
      }
      val (nvHits, nvSec) = time {
        // naive: sum of per-pattern contains flags (containment, not
        // occurrence counts — already strictly LESS work than AC does).
        // Balanced reduction: a left-nested reduce(_ + _) at k=1000
        // overflows the driver stack in the Column-node converter —
        // the naive shape can't even be BUILT without care
        val folded = lower(col("text"))
        def sumTree(cs: Seq[Column]): Column =
          if (cs.size == 1) cs.head
          else sumTree(cs.grouped(2).map(g =>
            if (g.size == 2) g(0) + g(1) else g(0)).toSeq)
        docs.select(sumTree(pats.map(p =>
            folded.contains(lit(p)).cast("long"))).as("h"))
          .agg(sum(col("h"))).collect()(0).getLong(0)
      }
      println(String.format(java.util.Locale.ROOT,
        """{"k":%d, "ac_sec":%.2f, "ac_hits":%d, "naive_contains_sec":%.2f, "naive_flagged":%d}""",
        Int.box(k), Double.box(acSec), Long.box(acHits),
        Double.box(nvSec), Long.box(nvHits)))
    }
    docs.unpersist()
    spark.stop()
  }
}
