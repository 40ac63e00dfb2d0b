package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-N stratified corpus sampling — "give me exactly `total` documents,
  * proportionally across strata (language, source, domain), reproducibly".
  * Sampling by fraction never lands on an exact budget; per-stratum quotas
  * come from largest-remainder allocation (floor base + one extra to the
  * strata with the biggest remainders — deterministic tie-break on rem
  * DESC, then stratum value ASC), and row selection is a deterministic
  * PORTABLE hash rank (first 8 md5 hex chars of the id as an integer), so
  * the same rows are picked by any engine that can compute md5 — no RNG,
  * no engine-specific hash.
  *
  * Scale: quota math runs on the per-stratum COUNT aggregate (tiny).
  * Selection avoids ranking whole strata in one task each (the naive
  * `row_number() OVER (PARTITION BY stratum)` puts an entire stratum in
  * one partition): rows are salted into `saltBuckets` sub-groups, each
  * sub-group keeps its own top-`quota` (the global top-`quota` is
  * necessarily contained in the union), and the final exact rank runs over
  * the <= saltBuckets * quota survivors — bounded by output size, not
  * corpus size.
  */
object Stratified {

  /** Portable deterministic per-row rank in [0, 2^32) — [[Mixing.hashU32]]
    * with an empty salt (md5(id || "") == md5(id)), kept as ONE definition
    * so the portable-hash convention cannot drift between the sampling
    * families.
    */
  def md5Rank(id: Column): Column = Mixing.hashU32(id, "")

  /** Largest-remainder quotas: exact split of `total` proportional to
    * per-stratum counts. Keys ordered by (remainder DESC, stratum ASC) get
    * the `total - sum(base)` leftover units. Requires total <= sum(counts).
    */
  private[etl] def quotas(counts: Seq[(String, Long)], total: Long): Seq[(String, Long)] = {
    val t = counts.map(_._2).sum
    require(total <= t, s"cannot sample $total rows from $t")
    require(counts.nonEmpty, "no strata")
    // BigInt for the proportional split: total * c overflows Long at the
    // corpus scales this module targets (total 1e9 x stratum 2e10 docs)
    val base = counts.map { case (k, c) =>
      val num = BigInt(total) * BigInt(c)
      (k, (num / t).toLong, (num % t).toLong)
    }
    val leftover = total - base.map(_._2).sum
    val bumped = base.sortBy { case (k, _, rem) => (-rem, k) }
      .zipWithIndex
      .map { case ((k, b, _), i) => (k, if (i < leftover) b + 1 else b) }
    bumped.sortBy(_._1)
  }

  /** Temperature-weighted largest-remainder quotas: the multilingual-LM
    * mixing rule (share_s proportional to count_s^alpha — Arivazhagan et
    * al. 2019; mT5/mC4) as EXACT integer arithmetic. Weights are
    * floor(count^alpha * weightScale): at the default alpha = 0.5,
    * sqrt is IEEE-754 correctly ROUNDED in every conforming engine and
    * the power-of-two scale + floor are exact, so the integer weight —
    * and hence every quota — replays bit-identically in DuckDB (the
    * q114 oracle does). Other alphas are supported but pow is not a
    * correctly-rounded operation, so cross-engine exactness is only
    * near-certain, not contractual. Quotas are capped at stratum
    * availability (an up-weighted rare stratum cannot be stretched past
    * its rows — no silent replication, no redistribution; the result
    * may then hold fewer than `total` rows, deterministically).
    */
  private[etl] def temperatureQuotas(
      counts: Seq[(String, Long)],
      total: Long,
      alpha: Double,
      weightScale: Long): Seq[(String, Long)] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(weightScale > 0, s"weightScale must be positive, got $weightScale")
    require(counts.nonEmpty, "no strata")
    val t = counts.map(_._2).sum
    require(total <= t, s"cannot sample $total rows from $t")
    val w = counts.map { case (k, c) =>
      val pw = if (alpha == 0.5) math.sqrt(c.toDouble) else math.pow(c.toDouble, alpha)
      (k, math.floor(pw * weightScale).toLong)
    }
    val bigW = w.map(x => BigInt(x._2)).sum
    val base = w.map { case (k, wt) =>
      val num = BigInt(total) * BigInt(wt)
      (k, (num / bigW).toLong, num % bigW)
    }
    val leftover = total - base.map(_._2).sum
    val bumped = base.sortBy { case (k, _, rem) => (-rem, k) }
      .zipWithIndex
      .map { case ((k, b, _), i) => (k, if (i < leftover) b + 1 else b) }
    val avail = counts.toMap
    bumped.map { case (k, q) => (k, math.min(q, avail(k))) }.sortBy(_._1)
  }

  /** Exactly `total` rows of `df`, proportionally stratified over the
    * string column `stratumCol`, rows chosen by [[md5Rank]] of `idCol`
    * (ties by id). Adds nothing and drops nothing else — output schema is
    * the input schema.
    */
  def exactProportionalSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      total: Long,
      saltBuckets: Int = 32): DataFrame =
    sampleByQuotas(df, stratumCol, idCol, quotas(_, total), saltBuckets)

  /** Temperature-resampled corpus mix: [[temperatureQuotas]] quotas over
    * `stratumCol`, rows chosen by the same portable [[md5Rank]] order —
    * the flattening step of multilingual-LM data mixing as one
    * deterministic, oracle-replayable operator.
    */
  def exactTemperatureSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      total: Long,
      alpha: Double = 0.5,
      weightScale: Long = 1L << 20,
      saltBuckets: Int = 32): DataFrame =
    sampleByQuotas(df, stratumCol, idCol,
      temperatureQuotas(_, total, alpha, weightScale), saltBuckets)

  private def sampleByQuotas(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      quotaFn: Seq[(String, Long)] => Seq[(String, Long)],
      saltBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // NULL strata get a sentinel key so they are sampled like any other
    // stratum (a raw equi-join on the null key would silently drop them,
    // and the quota sort would NPE on a null String); a real stratum
    // literally named the sentinel would merge with the null group —
    // accepted as vanishingly unlikely for the reserved name below
    val sentinel = "__graft_null_stratum__"
    val skey = "__graft_skey"
    val keyed = df.withColumn(skey, coalesce(col(stratumCol).cast("string"), lit(sentinel)))
    val counts: Seq[(String, Long)] = keyed.groupBy(col(skey)).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val q = quotaFn(counts)
    val qDf = broadcast(q.toDF(skey, "__graft_quota"))

    val originalCols = df.columns.toSeq
    val rk = md5Rank(col(idCol))
    val salted = keyed
      .withColumn("__graft_rk", rk)
      .withColumn("__graft_salt", pmod(col("__graft_rk"), lit(saltBuckets)).cast("int"))
      .join(qDf, Seq(skey))
    // level 1: per (stratum, salt) top-quota — bounds survivors at
    // saltBuckets * quota without ever ranking a full stratum in one task
    val w1 = Window.partitionBy(col(skey), col("__graft_salt"))
      .orderBy(col("__graft_rk"), col(idCol))
    // level 2: exact rank over the bounded survivor set
    val w2 = Window.partitionBy(col(skey))
      .orderBy(col("__graft_rk"), col(idCol))
    salted
      .withColumn("__graft_rn1", row_number().over(w1))
      .where(col("__graft_rn1") <= col("__graft_quota"))
      .withColumn("__graft_rn2", row_number().over(w2))
      .where(col("__graft_rn2") <= col("__graft_quota"))
      .select(originalCols.map(col): _*)
  }
}
