package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomMightContainExpr

/** Bloom-prefiltered EXACT anti-join — "remove everything already in the
  * blocklist" when the blocklist is too big to broadcast as a join hash
  * relation but its Bloom filter still fits in executor memory (a Bloom at
  * 1% fpp costs ~1.2 bytes/key vs tens of bytes/key for a broadcast hash
  * relation — ~25x more keys per MB). The canonical 100 TB uses: drop
  * already-crawled URLs, strip a prior snapshot's fingerprints, remove a
  * reference corpus's documents from a new crawl.
  *
  * Plan: probe the filter map-side. `might-contain = false` rows are
  * DEFINITELY clean — they bypass the join entirely and never shuffle.
  * Only the might-contain survivors (true positives + fpp of the corpus)
  * go through an exact anti-join that kills the false positives, so the
  * result EQUALS the plain anti-join (bloom false positives cannot drop a
  * row — they only send it to the confirm join; false negatives do not
  * exist). The corpus is scanned twice (columnar scans are cheap) to avoid
  * shuffling ~99% of it through a sort-merge join — the standard trade.
  */
object BloomFilters {

  /** Build a Bloom filter over `keyCol` of `keys` — distributed build via
    * Spark's sketch aggregate (`stat.bloomFilter`): per-partition filters
    * OR-merged treewise, one job, driver holds only the final bit array.
    */
  def build(keys: DataFrame, keyCol: String, expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    keys.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Membership-probe column against a built filter (codegen'd). */
  def mightContain(bloom: BloomFilter, key: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(BloomMightContainExpr(toExpr(key), bloom))
  }

  /** `corpus` minus rows whose `keyCol` appears in `blocklist.blKeyCol` —
    * exact `left_anti` semantics at bloom-prefilter cost. `expectedItems`
    * sizes the filter; pass the blocklist's approximate count (an
    * overestimate only wastes bits, an underestimate raises the fpp and
    * with it the confirm-join traffic — never correctness).
    */
  def antiJoin(
      corpus: DataFrame,
      keyCol: String,
      blocklist: DataFrame,
      blKeyCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bl = blocklist.select(col(blKeyCol).as(keyCol))
    val bloom = build(bl, keyCol, expectedItems, fpp)
    val probe = mightContain(bloom, col(keyCol))
    // NULL keys probe NULL: route them with the definitely-clean rows —
    // left_anti keeps null-key rows (NULL never equals a blocklist key),
    // and the equals-plain-anti-join contract must hold for them too
    val definitelyClean = corpus.where(probe.isNull || !probe)
    val confirmed = corpus.where(probe).join(bl, Seq(keyCol), "left_anti")
    definitelyClean.unionByName(confirmed)
  }
}
