package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.UnigramLm

/** Measures the PRE-TRAINED-model LM scoring path across decades: a
  * bounded trigram model trained ONCE on a reference corpus, then
  * broadcast map-side scoring of each scale dir — the CCNet-proper
  * shape whose cost is one scan + one per-doc aggregation, vs the
  * corpus-trained tiers that re-estimate per run and pay
  * corpus-sized model joins (q117 21x/decade exact-string, q120
  * 12x/decade hashed at 500k -> 5M docs).
  *
  *   runMain graft.tools.LmScoreScaleBench [trainDir] [scoreDir ...]
  */
object LmScoreScaleBench {
  def main(args: Array[String]): Unit = {
    val trainDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scoreDirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/repo/testdata-sf10", "/root/repo/testdata-sf100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val model = UnigramLm.trainNgramModelHashed(
      spark.read.parquet(s"$trainDir/documents.parquet"), "text",
      n = 3, maxGrams = 1000000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mRows = model.count()
    println(String.format(java.util.Locale.ROOT,
      """{"train_dir":"%s", "model_grams":%d, "train_sec":%.2f}""",
      trainDir, Long.box(mRows), Double.box((System.nanoTime() - t0) / 1e9)))

    scoreDirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count() // warm
      val t1 = System.nanoTime()
      val agg = UnigramLm.scoreNgramsWithModel(docs, "doc_id", "text", model, n = 3)
        .agg(count(lit(1)), avg(col("xent"))).collect()(0)
      println(String.format(java.util.Locale.ROOT,
        """{"score_dir":"%s", "docs":%d, "avg_xent":%.4f, "score_sec":%.2f}""",
        dir, Long.box(agg.getLong(0)), Double.box(agg.getDouble(1)),
        Double.box((System.nanoTime() - t1) / 1e9)))
    }
    spark.stop()
  }
}
