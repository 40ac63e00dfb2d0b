package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted corpus mixing — the "data recipe" step of a
  * training-data pipeline (upsample high-quality sources, downsample
  * boilerplate ones) as an exact, reproducible, shuffle-free plan.
  *
  * Selection: each row draws a uniform u32 from the md5 of its id plus a
  * salt and survives when `u < weight * 2^32`. Properties that matter at
  * 100 TB:
  *  - a pure per-row filter — no shuffle, no global pass, pushes through
  *    column pruning, trivially parallel at any scale;
  *  - deterministic in (id, salt): re-running the recipe or re-reading a
  *    partition reproduces the same subset (rand()-based sampling does
  *    not survive task retries);
  *  - engine-portable: md5 + hex arithmetic exist in ANSI-ish SQL, so an
  *    independent engine can replay the exact subset (q50's DuckDB
  *    oracle does, byte-for-byte).
  *
  * The reference engine has no corpus mixing; this extends the SURVEY's
  * sampling family (§2.8 seeded sampling) to the LLM-pipeline surface.
  */
object Mixing {

  /** Uniform value in [0, 2^32) derived from md5(id || salt): the first 8
    * hex chars as a long. Cheap (one md5 per row, codegen'd), and
    * identical in any engine with md5 + base-16 conversion.
    */
  def hashU32(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  /** Keep a deterministic `fraction` of rows, selected by id hash. The kept
    * count concentrates tightly around fraction * n (binomial), and the
    * SAME ids are kept on every run and every engine.
    */
  def sampleFraction(df: DataFrame, idCol: String, fraction: Double, salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.where(hashU32(col(idCol), salt) < lit(fraction * 4294967296.0))
  }

  /** Mix sources at the given weights: per-source deterministic resample
    * (decorrelated by a per-source salt) then union. Schemas must match by
    * name. Weights <= 1 downsample; weights > 1 UPSAMPLE by replication —
    * floor(w) exact copies of every row plus a deterministic
    * fractional-remainder sample (e.g. w = 2.5 keeps each row twice and
    * half the rows a third time) — the "repeat high-quality sources"
    * data-recipe epoch semantics.
    *
    * Weights above `maxWeight` (default 64 — replication means "epochs",
    * and even aggressive recipes stay in single digits) are rejected:
    * floor(w) materializes a w-element array per row before exploding,
    * so a typo'd 2500-for-2.5 would silently multiply the corpus three
    * orders of magnitude. Raise the cap explicitly if you truly mean it.
    */
  def weightedMix(
      sources: Seq[(DataFrame, Double)],
      idCol: String,
      salt: String = "",
      maxWeight: Double = 64.0): DataFrame = {
    require(sources.nonEmpty, "at least one source required")
    require(sources.forall(_._2 >= 0.0), "weights must be non-negative")
    require(sources.forall(_._2 <= maxWeight),
      s"weight ${sources.map(_._2).max} exceeds maxWeight=$maxWeight — " +
        "a weight is a replication factor (epochs); pass a larger maxWeight if intentional")
    sources.zipWithIndex.map { case ((df, w), i) =>
      if (w <= 1.0) sampleFraction(df, idCol, w, s"$salt$i")
      else {
        val k = math.floor(w).toLong
        val rem = w - k
        val copies = df.withColumn("__graft_mix_copy",
            explode(expr(s"sequence(1, $k)"))).drop("__graft_mix_copy")
        if (rem > 0.0)
          copies.unionByName(sampleFraction(df, idCol, rem, s"$salt$i"))
        else copies
      }
    }.reduce(_ unionByName _)
  }

  /** Per-group cap: keep at most `cap` rows per value of `groupCol`, the
    * kept rows chosen by the portable md5 rank of `idCol` (ties by id) —
    * the "at most N documents per domain" curation rule, deterministic
    * across runs and engines.
    *
    * Scale: the rank-filter pattern (`row_number() <= cap` over a
    * partitioned window) is exactly what Spark 4's InferWindowGroupLimit
    * rewrites into a WindowGroupLimit pair — each map task keeps only its
    * own top-`cap` per group BEFORE the shuffle, so the exchange carries
    * at most cap * numMapPartitions rows per group, not the group
    * (asserted in MixingSpec; contrast [[graft.etl.Stratified]], which
    * bounds the same selection explicitly via salted sub-group top-k for
    * engines without the rewrite).
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, cap: Int, salt: String = ""): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(!df.columns.contains("__graft_cap_rk"),
      "input already has a __graft_cap_rk column — rename it before capPerGroup")
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashU32(col(idCol), salt), col(idCol))
    df.withColumn("__graft_cap_rk", row_number().over(rk))
      .where(col("__graft_cap_rk") <= cap)
      .drop("__graft_cap_rk")
  }

  /** Deterministic train/val/test (or any k-way) split assignment: the
    * row's hash-uniform u in [0,1) picks the first label whose cumulative
    * fraction exceeds it. Same hash properties as [[sampleFraction]]:
    * shuffle-free, stable across runs/partitionings/engines, and uniform
    * WITHIN any stratum (so per-language or per-source proportions hold
    * without an explicit stratified pass). Fractions must sum to 1.
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "",
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0.0), "fractions must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val u = hashU32(col(idCol), salt).cast("double") / lit(4294967296.0)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((label, _), c), rest) => when(u < lit(c), lit(label)).otherwise(rest)
    }
    df.withColumn(outCol, expr)
  }
}
