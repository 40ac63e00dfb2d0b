package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // two domains; "NAV a" is universal in d1, "NAV b" universal in d2,
  // "Promo" appears in 2 of 4 d1 docs (exactly at frac 0.5)
  private def corpus = Seq(
    (1L, "d1", "NAV a\nbody one\nPromo"),
    (2L, "d1", "NAV a\nbody two\nPromo"),
    (3L, "d1", "  NAV a \nbody three"),
    (4L, "d1", "NAV a\n\nbody four"),
    (5L, "d2", "NAV b\nbody five"),
    (6L, "d2", "NAV b\nbody six"),
    (7L, "d2", "NAV a\nbody seven")).toDF("id", "dom", "text")

  test("universal lines stripped per domain; sub-threshold and blanks kept") {
    val out = Boilerplate.stripDomainBoilerplate(corpus, "text", "dom", "id",
        minFrac = 0.6, minDocs = 2)
      .select(col("id"), col("cleaned"), col("n_lines"), col("n_removed"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    // NAV a: 4/4 in d1 -> stripped there, INCLUDING whitespace-decorated
    // and its voting key is the stripped form
    assert(out(1L) === (("body one\nPromo"), 3, 1)) // Promo 2/4 = 0.5 < 0.6 kept
    assert(out(3L) === (("body three"), 2, 1))
    // blank line kept (never boilerplate), counts exact
    assert(out(4L) === (("\nbody four"), 3, 1))
    // NAV b universal in d2; NAV a is 1/3 in d2 -> kept there
    assert(out(5L) === (("body five"), 2, 1))
    assert(out(7L) === (("NAV a\nbody seven"), 2, 0))
  }

  test("frac boundary is inclusive and minDocs is an absolute floor") {
    val atHalf = Boilerplate.stripDomainBoilerplate(corpus, "text", "dom", "id",
        minFrac = 0.5, minDocs = 2)
      .where(col("id") === 1).select(col("cleaned")).collect()(0).getString(0)
    assert(atHalf === "body one") // Promo 2/4 = 0.5 >= 0.5 -> now stripped
    // single-doc "domain": universal within it, but df = 1 < minDocs
    val solo = Seq((9L, "solo", "only line\nonly line")).toDF("id", "dom", "text")
    val out = Boilerplate.stripDomainBoilerplate(solo, "text", "dom", "id",
        minFrac = 0.5, minDocs = 2)
      .select(col("cleaned"), col("n_removed")).collect()(0)
    assert(out.getString(0) === "only line\nonly line")
    assert(out.getInt(1) === 0)
  }

  test("kept lines preserve original bytes and order; all-removed is distinguishable") {
    val fps = Seq(Boilerplate.lineFp60("x")).toDF("f")
      .agg(sort_array(collect_list(col("f"))).as("fps"))
    val df = Seq((1L, " x \nx"), (2L, "")).toDF("id", "t")
      .crossJoin(fps)
      .select(col("id"), Boilerplate.stripLinesByFp(col("t"), col("fps")).as("r"))
      .orderBy("id").collect()
    // both decorated forms of "x" strip to the fp and are removed; the
    // cleaned "" with n_lines 2 n_removed 2 is NOT one kept blank line
    assert(df(0).getStruct(1).getString(0) === "")
    assert(df(0).getStruct(1).getInt(1) === 2)
    assert(df(0).getStruct(1).getInt(2) === 2)
    // empty doc: one blank line, kept
    assert(df(1).getStruct(1).getString(0) === "")
    assert(df(1).getStruct(1).getInt(1) === 1)
    assert(df(1).getStruct(1).getInt(2) === 0)
  }

  test("null text passes through as null struct") {
    val out = Seq((1L, "d", null.asInstanceOf[String]), (2L, "d", "a\na"))
      .toDF("id", "dom", "text")
    val r = Boilerplate.stripDomainBoilerplate(out, "text", "dom", "id")
      .select(col("id"), col("cleaned")).orderBy("id").collect()
    assert(r(0).isNullAt(1))
  }

  test("fp and strip conventions match the portable oracle formulas") {
    // md5-60: first 15 hex digits as a long (the KMV/winnowing convention)
    val viaCol = Seq(Tuple1("NAV a")).toDF("s")
      .select(graft.sketch.Kmv.hash60(col("s"))).collect()(0).getLong(0)
    assert(Boilerplate.lineFp60("NAV a") === viaCol)
    // strip twin: ASCII class only, unicode spaces untouched
    assert(Boilerplate.stripAscii(" \t x \u000B ") === "x")
    assert(Boilerplate.stripAscii("\u00A0x\u00A0") === "\u00A0x\u00A0")
  }

  test("stripByFp kernel: sorted fast path and unsorted fallback agree") {
    // the kernel contract is sorted fps (both producers emit sorted
    // arrays); an out-of-contract unsorted array must still strip
    // correctly via the one-off fallback sort
    val text = "keep me\nNAV a\nNAV b\nalso keep"
    val fpA = Boilerplate.lineFp60("NAV a")
    val fpB = Boilerplate.lineFp60("NAV b")
    val sorted = Seq(fpA, fpB).sorted
    val unsorted = sorted.reverse
    def strip(fps: Seq[Long]): (String, Int, Int) = {
      val r = Seq(Tuple1(text)).toDF("t")
        .select(Boilerplate.stripLinesByFp(col("t"),
          typedLit(fps)).as("r"))
        .select(col("r.cleaned"), col("r.n_lines"), col("r.n_removed"))
        .collect()(0)
      (r.getString(0), r.getInt(1), r.getInt(2))
    }
    val want = ("keep me\nalso keep", 4, 2)
    assert(strip(sorted) === want)
    assert(strip(unsorted) === want)
  }
}
