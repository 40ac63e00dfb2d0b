package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Decomposes q106's decade cost (fuzzy benchmark decontamination):
  * times the corpus-side signature+banding scan alone, the candidate
  * generation (broadcast band join + distinct), and the full pipeline —
  * for BOTH the portable (md5) and production (splitmix64) signature
  * families — so the superlinear component is measured, not guessed
  * (round-8 verdict "What's wrong" #6: 6.6x/decade at sf10 -> sf100,
  * attributed to corpus-side md5 portable signatures by argument only).
  *
  *   runMain graft.tools.DecontamProbe [dir1 dir2 ...]
  */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/repo/testdata-sf10", "/root/repo/testdata-sf100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (kSh, bands, rpb, nH) = (5, 8, 4, 32)

    def run(dir: String): Unit = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count() // warm
      val bench = docs.where(col("doc_id") % 83 === 0)
        .select(col("doc_id"),
          when(col("doc_id") % 166 === 0, col("text"))
            .otherwise(concat(col("text"),
              lit(" benchmark held out split marker tokens"))).as("text"))

      def time[A](what: String, f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(String.format(java.util.Locale.ROOT,
          """{"dir":"%s", "stage":"%s", "sec":%.2f}""",
          dir, what, Double.box((System.nanoTime() - t0) / 1e9)))
        r
      }

      Seq(true, false).foreach { portable =>
        val tag = if (portable) "portable" else "production"
        def sigOf(c: org.apache.spark.sql.Column) =
          if (portable) TextFunctions.minhashPortableSignature(c, kSh, nH, 42L)
          else TextFunctions.minhashSignature(c, kSh, nH, 42L)
        // stage 1: corpus signature scan alone (banding is plain column
        // math over the signature — negligible next to the hashing)
        time(s"$tag:signature_scan", {
          docs.select(sigOf(col("text")).as("s"))
            .select(sum(size(col("s")))).collect()
        })
        // stage 2: candidate generation — band explode + broadcast band
        // join + distinct (the only corpus-derived exchange in the plan)
        def banded(df: DataFrame, id: String): DataFrame = {
          val sig = df.select(col(id), sigOf(col("text")).as("__sig"))
            .where(size(col("__sig")) > 0)
          val bandCols = (0 until bands).map { b =>
            struct(lit(b).as("band"),
              concat_ws(",", slice(col("__sig"), b * rpb + 1, rpb)
                .cast("array<string>")).as("key"))
          }
          sig.select(col(id), explode(array(bandCols: _*)).as("__bk"))
            .select(col(id), col("__bk.band").as("__band"), col("__bk.key").as("__key"))
        }
        val nCand = time(s"$tag:candidates", {
          banded(docs, "doc_id")
            .join(broadcast(banded(
              bench.select(col("doc_id").as("__bench_id"), col("text")), "__bench_id")),
              Seq("__band", "__key"))
            .select(col("doc_id"), col("__bench_id")).distinct().count()
        })
        println(s"""{"dir":"$dir", "family":"$tag", "n_candidates":$nCand}""")
        // stage 3: the full operator
        time(s"$tag:full", {
          graft.text.Decontaminate.fuzzyOverlapReport(
            docs, bench, "doc_id", "text", threshold = 0.5, portable = portable).count()
        })
        graft.etl.CacheTracker.unpersistCaches(blocking = true)
      }
    }
    dirs.foreach(run)
    spark.stop()
  }
}
