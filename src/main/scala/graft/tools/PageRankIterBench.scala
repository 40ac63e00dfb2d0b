package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** Times pageRank at real iteration counts (default 20 — tens of
  * iterations is the realistic link-graph regime, vs q105's gate-scale
  * 5) across localCheckpoint cadences, to put the plan-growth fix on
  * record: without periodic checkpoints the unrolled 20-iteration plan
  * pays analysis + codegen superlinear in `iters`; with them the loop
  * cost is per-iteration flat. Edges derive from documents with q105's
  * synthetic host formula so the graph scales with the corpus.
  *
  *   runMain graft.tools.PageRankIterBench [dir] [iters] [cadences-csv]
  */
object PageRankIterBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/testdata-sf10"
    val iters = if (args.length > 1) args(1).toInt else 20
    val cadences = (if (args.length > 2) args(2) else "1000000,10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // q105's synthetic page/link formula, so the edge count tracks docs
    val id = col("doc_id")
    def tldOf(d: Column) = when(d % 3 === 0, lit("co.uk")).otherwise(lit("com"))
    def hostOf(d: Column) = concat(lit("dom"), d, lit("."), tldOf(d))
    val h = id % 11
    val a = (h + 1) % 11
    val b = (h * 3 + 7) % 11
    val pageUrl = concat(lit("https://www."), hostOf(h), lit("/page/"), id)
    val html = concat(
      lit("<html><body><a href=\"https://www."), hostOf(a),
      lit("/x\">one</a><a href=\"HTTPS://"), hostOf(b),
      lit(":443/y?q=1\">two</a></body></html>"))
    val pages = spark.read.parquet(s"$dir/documents.parquet")
      .select(pageUrl.as("page_url"), html.as("html"))
    val edges = LinkGraph.domainEdges(pages, "page_url", "html")
    edges.count() // warm: parquet footers, codegen, href extraction

    cadences.foreach { every =>
      val t0 = System.nanoTime()
      val sum = LinkGraph.pageRank(edges, iters = iters, checkpointEvery = every)
        .agg(org.apache.spark.sql.functions.sum(col("rank"))).collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      graft.etl.CacheTracker.unpersistCaches(blocking = true)
      println(String.format(java.util.Locale.ROOT,
        """{"dir":"%s", "iters":%d, "checkpointEvery":%d, "rank_mass":%d, "sec":%.2f}""",
        dir, Int.box(iters), Int.box(every), Long.box(sum), Double.box(sec)))
    }
    spark.stop()
  }
}
