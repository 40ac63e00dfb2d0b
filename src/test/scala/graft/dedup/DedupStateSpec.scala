package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    d
  }

  // crawl 1 (ids 0..9) and crawl 2 (ids 100..109) with duplicates both
  // WITHIN crawl 2 and ACROSS the crawls (same normalized content)
  private def crawl1 = (0L until 10L)
    .map(i => (i, s"doc number ${i % 6} body")).toDF("doc_id", "text")
  private def crawl2 = (100L until 110L)
    .map(i => (i, s"doc number ${i % 8} body")).toDF("doc_id", "text")

  test("incremental dedup vs state == batch dedup over the union") {
    val state = DedupState.fingerprintState(crawl1, "text")
    val incr = Dedup.exact(crawl1, "text", "doc_id")
      .unionByName(DedupState.exactVsState(crawl2, "text", "doc_id", state))
      .select("doc_id").as[Long].collect().sorted
    val batch = Dedup.exact(crawl1.unionByName(crawl2), "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(incr.nonEmpty)
    assert(incr.toSeq === batch.toSeq)
  }

  test("fingerprint state survives a parquet roundtrip; merge is idempotent") {
    val dir = tmpDir("fpstate")
    val state = DedupState.fingerprintState(crawl1, "text")
    DedupState.saveFingerprintState(state, dir)
    val loaded = DedupState.loadFingerprintState(spark, dir)
    assert(loaded.as[String].collect().sorted.toSeq ===
      state.as[String].collect().sorted.toSeq)
    // results against the LOADED state match results against the live one
    val a = DedupState.exactVsState(crawl2, "text", "doc_id", state)
      .select("doc_id").as[Long].collect().sorted
    val b = DedupState.exactVsState(crawl2, "text", "doc_id", loaded)
      .select("doc_id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
    // merging a state with itself changes nothing
    val merged = DedupState.mergeFingerprintStates(loaded, state)
    assert(merged.count() === state.count())
    // rolling crawl 2 in == state of the union
    val rolled = DedupState.mergeFingerprintStates(
      state, DedupState.fingerprintState(crawl2, "text"))
    val direct = DedupState.fingerprintState(crawl1.unionByName(crawl2), "text")
    assert(rolled.as[String].collect().sorted.toSeq ===
      direct.as[String].collect().sorted.toSeq)
  }

  test("null texts pass through exactVsState un-deduped") {
    val state = DedupState.fingerprintState(crawl1, "text")
    val nulls = Seq((200L, null.asInstanceOf[String]), (201L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = DedupState.exactVsState(nulls, "text", "doc_id", state)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(200L, 201L))
  }

  test("malformed state artifacts fail fast") {
    intercept[IllegalArgumentException] {
      DedupState.exactVsState(crawl2, "text", "doc_id",
        Seq(("x", 1)).toDF("fingerprint", "extra"))
    }
    intercept[IllegalArgumentException] {
      DedupState.saveFingerprintState(Seq(1L).toDF("fingerprint"), tmpDir("bad"))
    }
  }

  test("hll state roundtrip: merge(loaded c1, sketch c2) == direct sketch of the union") {
    import graft.sketch.{Hll, Kmv}
    val p = 11
    def sk(df: org.apache.spark.sql.DataFrame) = df
      .select(col("text"), Kmv.hash60(col("text")).as("h"))
      .groupBy(lit("g").as("group")).agg(Hll.sketch(col("h"), p).as("reg"))
    val dir = tmpDir("hllstate")
    DedupState.saveHllState(sk(crawl1), p, dir)
    val loaded = DedupState.loadHllState(spark, dir, p)
    val merged = loaded.select(col("group"), col("reg"))
      .unionByName(sk(crawl2))
      .groupBy(col("group")).agg(Hll.mergeSketches(col("reg"), p).as("reg"))
      .select(Hll.checksum(col("reg")).as("ck")).as[Long].collect()
    val direct = sk(crawl1.unionByName(crawl2))
      .select(Hll.checksum(col("reg")).as("ck")).as[Long].collect()
    assert(merged.toSeq === direct.toSeq, "register rollup through the artifact must be bit-identical")
    // precision mismatch refuses to load
    intercept[IllegalArgumentException] { DedupState.loadHllState(spark, dir, 10) }
  }
}
