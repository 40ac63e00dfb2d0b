package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cli.CurateCorpus

/** End-to-end curation funnel at the 10x scaling point (sf1), with the
  * Export layout bounds VERIFIED on the result — the run that proves the
  * clean -> dedup -> decontaminate -> cap -> split -> sharded-export chain
  * holds its file-count/size contract under real volume, not just in
  * `ExportSpec`'s synthetic 2000-row fixture.
  *
  * Asserts, in `ExportSpec` style, over the actual output tree:
  *  - hive layout: only `split=` / `lang=` directory levels, values from
  *    the declared domains;
  *  - per-file row bound: no parquet file exceeds `maxPerFile` rows;
  *  - no small-files explosion: total file count stays near
  *    `rows / maxPerFile + #dirs`, not `writerTasks x #dirs`;
  *  - losslessness: rows read back == rows the funnel reported.
  *
  * Prints one JSON line (stage counts, file stats, wall seconds) for the
  * BENCHNOTES run log.
  *
  * Usage: runMain graft.tools.CurateAtScale [sfDir] [outDir] [maxPerFile]
  */
object CurateAtScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_curate_sf1").toString)
    val maxPerFile = args.lift(2).map(_.toInt).getOrElse(20000)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val stats = CurateCorpus.run(docs, outDir,
        minQuality = 0.5, chunkWords = 10, benchMod = 17, ngram = 5,
        maxPerFile = maxPerFile, maxPerSource = 0).toMap
      val funnelSec = (System.nanoTime() - t0) / 1e9

      // ---- layout verification (ExportSpec contract, at volume) ----
      val root = new java.io.File(outDir)
      val splitDirs = root.listFiles().filter(_.isDirectory)
      require(splitDirs.nonEmpty && splitDirs.forall(_.getName.startsWith("split=")),
        s"unexpected top-level entries: ${splitDirs.map(_.getName).mkString(",")}")
      require(splitDirs.map(_.getName).toSet.subsetOf(
        Set("split=train", "split=val", "split=test")), "unknown split value")
      val leafDirs = splitDirs.flatMap(_.listFiles().filter(_.isDirectory))
      require(leafDirs.forall(_.getName.startsWith("lang=")),
        "second partition level is not lang=")
      val files = leafDirs.flatMap(_.listFiles()
        .filter(_.getName.endsWith(".parquet")))
      require(files.nonEmpty, "no parquet files written")

      // per-file row bound: ONE job over the whole tree grouped by source
      // file (a per-file spark.read/count loop submits hundreds of
      // sequential driver jobs at real file counts)
      val perFileCounts = spark.read.parquet(outDir)
        .groupBy(input_file_name().as("__f")).count()
        .collect().map(_.getLong(1))
      require(perFileCounts.length == files.length,
        s"file count mismatch: listed ${files.length}, read ${perFileCounts.length}")
      val maxFileRows = perFileCounts.max
      require(maxFileRows <= maxPerFile,
        s"file row bound violated: $maxFileRows > $maxPerFile")

      // no small-files explosion: allow one partial file per leaf dir on
      // top of the row-bound-implied minimum
      val exported = stats("per_source_cap")
      val bound = leafDirs.length + exported / maxPerFile + 1
      require(files.length <= bound,
        s"small-files explosion: ${files.length} files > bound $bound")

      // losslessness
      val back = spark.read.parquet(outDir).count()
      require(back == exported, s"read-back $back != exported $exported")

      val totalSec = (System.nanoTime() - t0) / 1e9
      val stageJson = stats.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString(",")
      // Locale.ROOT: the f-interpolator uses the default locale, and a
      // comma-decimal locale would emit invalid JSON (same fix as
      // DedupScalingBench)
      val fs = String.format(java.util.Locale.ROOT, "%.1f", Double.box(funnelSec))
      val ts = String.format(java.util.Locale.ROOT, "%.1f", Double.box(totalSec))
      println(s"""{"sf_dir":"$sfDir",$stageJson,"files":${files.length},""" +
        s""""leaf_dirs":${leafDirs.length},"max_file_rows":$maxFileRows,""" +
        s""""max_per_file":$maxPerFile,"funnel_sec":$fs,""" +
        s""""total_sec":$ts,"layout_ok":true}""")
    } finally spark.stop()
  }
}
