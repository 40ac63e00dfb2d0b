package graft.cli

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurateCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline runs end-to-end on the sf0.001 fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Files.createTempDirectory("graft_curate").toString
    val stats = CurateCorpus.run(docs, out,
      minQuality = 0.5, chunkWords = 10, benchMod = 17, ngram = 5,
      maxPerFile = 1000).toMap

    // monotone funnel: every stage only removes rows
    assert(stats("input") == 500L)
    assert(stats("quality") <= stats("input"))
    assert(stats("exact_dedup") <= stats("quality"))
    assert(stats("span_dedup") <= stats("exact_dedup"))
    assert(stats("decontaminated") <= stats("span_dedup"))
    assert(stats("decontaminated") > 300L, s"over-aggressive pipeline: $stats")

    // export: hive tree split=/lang=, losslessly readable, counts match
    val back = spark.read.parquet(out)
    assert(back.count() == stats("decontaminated"))
    val splits = back.select($"split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    // the benchmark slice was held out, never exported
    assert(back.where(pmod($"doc_id", lit(17)) === 16).count() == 0)
    // no document survived with a duplicated 10-word chunk across corpus
    val dupChunks = back
      .select(explode(graft.functions.TextFunctions.wordChunks($"text", 10)).as("c"))
      .groupBy($"c").count().where($"count" > 1).count()
    assert(dupChunks == 0L, s"$dupChunks duplicated chunks survived")
  }

  test("per-source cap stage bounds every source and stays monotone") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Files.createTempDirectory("graft_curate_cap").toString
    val stats = CurateCorpus.run(docs, out,
      minQuality = 0.5, maxPerFile = 1000, maxPerSource = 5).toMap
    assert(stats("per_source_cap") <= stats("decontaminated"))
    val back = spark.read.parquet(out)
    assert(back.count() == stats("per_source_cap"))
    val maxPerSrc = back.groupBy($"source").count()
      .agg(max($"count")).collect()(0).getLong(0)
    assert(maxPerSrc <= 5L, s"a source exceeded the cap: $maxPerSrc")
  }
}
