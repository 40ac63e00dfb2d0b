package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Persistable dedup state — CROSS-CRAWL incremental deduplication.
  *
  * A real pipeline dedups crawl N+1 against crawls 1..N without ever
  * rescanning them: what survives between runs is a compact ARTIFACT —
  * the distinct content fingerprints (exact dedup) or the per-group HLL
  * register tables (distinct accounting) — saved as parquet with a
  * pinned schema contract and loaded by the next run. Both artifacts
  * are tiny next to the corpus (one 32-char fp per distinct document;
  * 2 KiB of registers per group) and both are UNION-mergeable, so state
  * maintenance is `merge(state, stateOf(newCrawl))` — never a rescan.
  *
  * Equivalence contract (spec-proved in `DedupStateSpec`): with crawl-1
  * ids ordered before crawl-2 ids (the arrival order an incremental run
  * has by construction),
  *
  *   exact(c1 UNION c2)  ==  exact(c1) UNION exactVsState(c2, stateOf(c1))
  *
  * and for HLL, `mergeSketches(load(save(sketchOf(c1))), sketchOf(c2))`
  * is bit-identical to sketching c1 UNION c2 directly (the register
  * elementwise-max merge property, [[graft.sketch.Hll]]).
  *
  * Scale shape: [[exactVsState]] is one LEFT ANTI join on the uniform
  * fingerprint key (state side shuffles once; at extreme state sizes
  * both sides hash-partition — the canonical incremental-dedup plan)
  * plus the same single dedup shuffle as [[Dedup.exact]]. No broadcast
  * assumption on the state: billions of fingerprints stay distributed.
  */
object DedupState {

  /** Schema contract for the fingerprint artifact: one non-null
    * normalized content fingerprint per row.
    */
  val FingerprintStateSchema: StructType =
    StructType(Seq(StructField("fingerprint", StringType, nullable = false)))

  /** Schema contract for the HLL artifact: one register array per group,
    * with the precision pinned IN the artifact so a mismatched reader
    * fails loudly instead of merging incompatible registers.
    */
  val HllStateSchema: StructType = StructType(Seq(
    StructField("group", StringType, nullable = true),
    StructField("p", IntegerType, nullable = false),
    StructField("reg", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** The distinct content fingerprints of a corpus — the exact-dedup
    * state artifact. NULL fingerprints (null text) are NOT state: null
    * texts are never duplicates of each other ([[Dedup.exact]]).
    */
  def fingerprintState(df: DataFrame, textCol: String,
      unicode: Boolean = false, nfc: Boolean = false): DataFrame =
    df.select(TextFunctions.fingerprint(col(textCol), unicode, nfc).as("fingerprint"))
      .where(col("fingerprint").isNotNull)
      .distinct()

  /** Union-merge two fingerprint states (idempotent, commutative). */
  def mergeFingerprintStates(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("fingerprint")).union(b.select(col("fingerprint"))).distinct()

  def saveFingerprintState(state: DataFrame, path: String): Unit = {
    requireSchema(state.schema, FingerprintStateSchema, "fingerprint state")
    state.write.mode("overwrite").parquet(path)
  }

  def loadFingerprintState(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    requireSchema(df.schema, FingerprintStateSchema, s"fingerprint state at $path")
    df
  }

  /** Incremental [[Dedup.exact]]: drop rows whose fingerprint is already
    * in `state` (a prior-crawls artifact), then dedup WITHIN the batch
    * keeping the smallest `idCol` per duplicate set — so with batch ids
    * above all prior ids, the result is exactly the rows `exact` over
    * the full history would have added. NULL texts pass through
    * un-deduped (same contract as [[Dedup.exact]]).
    */
  def exactVsState(df: DataFrame, textCol: String, idCol: String,
      state: DataFrame,
      unicode: Boolean = false, nfc: Boolean = false): DataFrame = {
    requireSchema(state.schema, FingerprintStateSchema, "fingerprint state")
    val fp = TextFunctions.fingerprint(col(textCol), unicode, nfc)
    // the null sentinel can never collide with a real fingerprint (hex)
    val key = coalesce(fp, concat(lit("__graft_null__:"), col(idCol).cast("string")))
    val fresh = df.withColumn("__graft_fp", key)
      .join(state.select(col("fingerprint").as("__graft_fp")), Seq("__graft_fp"), "left_anti")
    val w = Window.partitionBy(col("__graft_fp")).orderBy(col(idCol))
    fresh.withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1)
      .drop("__graft_rn", "__graft_fp")
  }

  /** Persist per-group HLL register tables: `sketches` must be
    * (group, reg) as produced by
    * `df.groupBy(group).agg(Hll.sketch(hashes, p))` — the precision is
    * stamped into every row so [[loadHllState]] can refuse a mismatch.
    */
  def saveHllState(sketches: DataFrame, p: Int, path: String): Unit = {
    val m = 1 << p
    val stamped = sketches
      .select(col("group").cast("string").as("group"), lit(p).as("p"), col("reg"))
    requireSchema(stamped.schema, HllStateSchema, "hll state")
    // fail fast on a register array that cannot be a p-precision sketch
    val bad = stamped.where(size(col("reg")) =!= m).limit(1).count()
    require(bad == 0, s"hll state rows must carry 2^$p = $m registers")
    stamped.write.mode("overwrite").parquet(path)
  }

  /** Load a register-table artifact, checking the schema contract and
    * that the stored precision matches the caller's `p`.
    */
  def loadHllState(spark: SparkSession, path: String, p: Int): DataFrame = {
    val df = spark.read.parquet(path)
    requireSchema(df.schema, HllStateSchema, s"hll state at $path")
    val wrong = df.where(col("p") =!= p).limit(1).count()
    require(wrong == 0, s"hll state at $path was written at a different precision than p=$p")
    df.select(col("group"), col("reg"))
  }

  /** Schema contract for the KMV artifact: one k-minimum-values sketch
    * (sorted long array, <= k entries) per group, the k stamped in.
    */
  val KmvStateSchema: StructType = StructType(Seq(
    StructField("group", StringType, nullable = true),
    StructField("k", IntegerType, nullable = false),
    StructField("sk", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Persist per-group KMV sketch tables: `sketches` must be (group, sk)
    * as produced by `df.groupBy(group).agg(Kmv.sketch(hashes, k))`.
    * Loaded sketches merge with new data by re-aggregation —
    * `Kmv.sketch` accepts array<long> input, and the k smallest of a
    * union of k-smallest sets IS the union's sketch — so cross-crawl
    * distinct/Jaccard accounting never rescans prior crawls.
    */
  def saveKmvState(sketches: DataFrame, k: Int, path: String): Unit = {
    val stamped = sketches
      .select(col("group").cast("string").as("group"), lit(k).as("k"), col("sk"))
    requireSchema(stamped.schema, KmvStateSchema, "kmv state")
    val bad = stamped.where(size(col("sk")) > k).limit(1).count()
    require(bad == 0, s"kmv state rows must carry at most k = $k values")
    stamped.write.mode("overwrite").parquet(path)
  }

  /** Load a KMV artifact, checking the schema contract and that the
    * stored k matches the caller's.
    */
  def loadKmvState(spark: SparkSession, path: String, k: Int): DataFrame = {
    val df = spark.read.parquet(path)
    requireSchema(df.schema, KmvStateSchema, s"kmv state at $path")
    val wrong = df.where(col("k") =!= k).limit(1).count()
    require(wrong == 0, s"kmv state at $path was written at a different k than $k")
    df.select(col("group"), col("sk"))
  }

  private def requireSchema(got: StructType, want: StructType, what: String): Unit = {
    // compare names + type SHAPES only: parquet roundtrips legitimately
    // flip nullability flags (field nullable, array containsNull)
    val gotNorm = got.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    val wantNorm = want.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    require(gotNorm == wantNorm,
      s"$what schema mismatch: got ${got.simpleString}, want ${want.simpleString}")
  }
}
