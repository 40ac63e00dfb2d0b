package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WetSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_wet_spec")

  test("WET roundtrip through real gzipped shards: byte-exact, warcinfo skipped") {
    val docsIn = Seq(
      (0L, "plain ascii body"),
      (1L, "multi-byte: café 漢字 😀 end"),
      (2L, "embedded\r\nCRLF and WARC/1.0 lookalike inside"),
      (3L, ""))
    val records = docsIn.map { case (id, text) =>
      id -> Wet.conversionRecord(s"https://example.org/doc/$id", text)
    }
    val info = (0 until 2).map(sh =>
      (sh.toLong - 2) -> Wet.warcinfoRecord(s"shard_$sh.warc.wet.gz"))
    val dir = tmpDir()
    WarcFiles.writeShards(info ++ records, dir, nShards = 2)
    val got = Wet.docs(Wet.readWetGz(spark, dir.toString + "/*.warc.gz"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val want = docsIn.map { case (id, text) =>
      (s"https://example.org/doc/$id", text.codePointCount(0, text.length), text)
    }.toSet
    assert(got === want) // warcinfo records contribute nothing
  }

  test("conversion record framing: octet-accurate Content-Length for multi-byte text") {
    val text = "é漢" // 2 chars, 5 UTF-8 octets
    val rec = Wet.conversionRecord("https://x/1", text)
    assert(rec.contains("Content-Length: 5\r\n"))
    assert(rec.contains("WARC-Type: conversion\r\n"))
    val parsed = Seq((0L, rec)).toDF("id", "blob")
      .select(explode(Warc.parseRecords(col("blob"))).as("r"))
      .select(col("r.warc_type"), col("r.payload"))
      .collect()
    assert(parsed.length === 1)
    assert(parsed(0).getString(0) === "conversion")
    assert(parsed(0).getString(1) === text)
  }

  test("corrupt tail quarantines: the valid record prefix survives") {
    val good = Wet.conversionRecord("https://x/ok", "good body here")
    val truncated = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x/bad\r\nContent-Length: 99999\r\n\r\nshort"
    val got = Wet.docs(Seq((0L, good + truncated)).toDF("id", "blob"), "blob")
      .collect()
    assert(got.length === 1)
    assert(got(0).getString(0) === "https://x/ok")
  }
}
