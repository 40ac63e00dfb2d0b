package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recode/feature-prep primitives covering the reference's ETL surface
  * (reference `replication_package/src/getdataset.py`): threshold
  * binarization (~20 call sites, e.g. `getdataset.py:99-101`), explicit-edge
  * binning (`:21-32`), quantile binning (`:340`), one-hot (`:35-48`), value
  * replace (`:230-236`), z-scoring (`:172`). All pure Column/DataFrame ops —
  * Catalyst folds the `when` ladders into codegen'd branches.
  */
object Recode {

  /** `data.loc[data[k] < t, k] = 0 ; else 1` — the reference's dominant
    * recode idiom (threshold binarization).
    */
  def binarize(c: Column, threshold: Double): Column =
    when(c < threshold, 0).otherwise(1)

  /** pandas `cut`: explicit right-closed edges (lo, hi], values outside -> null.
    * `labels(i)` names bin (edges(i), edges(i+1)].
    */
  def cut(c: Column, edges: Seq[Double], labels: Seq[String]): Column = {
    require(labels.length == edges.length - 1, "need one label per bin")
    val branches = edges.sliding(2).zip(labels.iterator).map {
      case (Seq(lo, hi), lbl) => (c > lo && c <= hi, lit(lbl))
    }.toSeq
    branches.foldLeft(lit(null).cast("string")) { case (acc, (cond, lbl)) =>
      when(cond, lbl).otherwise(acc)
    }
  }

  /** pandas `qcut(col, q)`: quantile binning into q near-equal-frequency
    * buckets, computed with EXACT quantiles (approxQuantile relativeError=0)
    * then a `when` ladder — two jobs total regardless of data size.
    */
  def qcut(df: DataFrame, colName: String, q: Int, labels: Seq[String]): DataFrame = {
    require(labels.length == q, "need one label per quantile bucket")
    val probs = (0 to q).map(_.toDouble / q).toArray
    val edges = df.stat.approxQuantile(colName, probs, 0.0)
    val c = col(colName)
    val branches = edges.toSeq.sliding(2).zip(labels.iterator).zipWithIndex.map {
      case ((Seq(lo, hi), lbl), i) =>
        // first bucket left-closed like pandas qcut
        (if (i == 0) c >= lo && c <= hi else c > lo && c <= hi, lbl)
    }.toSeq
    val ladder = branches.foldLeft(lit(null).cast("string")) { case (acc, (cond, lbl)) =>
      when(cond, lit(lbl)).otherwise(acc)
    }
    df.withColumn(s"${colName}_bin", ladder)
  }

  /** pandas `get_dummies` with literal column-per-value semantics
    * (reference `getdataset.py:35-48`): one 0/1 column per distinct value.
    * One small distinct job to enumerate values, then pure projections.
    */
  def oneHot(df: DataFrame, colName: String, prefix: Option[String] = None): DataFrame = {
    val values = df.select(colName).distinct().collect()
      .map(_.get(0)).filter(_ != null).map(_.toString).sorted
    // ONE Project for the whole dummy block: a per-value withColumn fold
    // nests one Project per category (~100 on adult), and Catalyst
    // re-analysis of that tower per action is quadratic — measured as
    // minutes of driver CPU on the adult one-hot plan. ListMap keeps the
    // exact append order of the old fold.
    // Dummy names differing only by case (e.g. values "Yes"/"yes") would
    // make withColumns throw under Spark's default case-insensitive
    // resolution; keep the old per-column-fold behavior (last wins) by
    // deduping to the session's resolution rules — under
    // spark.sql.caseSensitive=true both names are distinct legal columns
    // and deduping would silently drop a category.
    val named = values.map { v =>
      val name = prefix.map(p => s"${p}_$v").getOrElse(v)
      name -> when(col(colName) === v, 1).otherwise(0)
    }
    val caseSensitive = df.sparkSession.sessionState.conf.caseSensitiveAnalysis
    val lastIdx = named.zipWithIndex
      .groupBy { case ((name, _), _) =>
        if (caseSensitive) name else name.toLowerCase(java.util.Locale.ROOT)
      }
      .map { case (_, g) => g.last._2 }.toSet
    val dummies = scala.collection.immutable.ListMap(
      named.zipWithIndex.collect { case (nv, i) if lastIdx(i) => nv }: _*)
    df.withColumns(dummies)
  }

  /** pandas `replace({from -> to})` on one column. */
  def replaceValues(c: Column, mapping: Map[Any, Any]): Column =
    mapping.foldLeft(c) { case (acc, (from, to)) =>
      when(c === lit(from), lit(to)).otherwise(acc)
    }

  /** Z-score standardization of the given numeric columns:
    * `(x - mean) / std` (sample std, pandas `DataFrame.std` semantics,
    * reference `getdataset.py:172`). One aggregation job for all columns.
    */
  def zscore(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(avg(col(c)).as(s"__m_$c"), stddev_samp(col(c)).as(s"__s_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val statIdx = cols.zipWithIndex.map { case (c, i) => c -> (stats.getDouble(2 * i), stats.getDouble(2 * i + 1)) }.toMap
    // one Project for all standardized columns (crime z-scores ~100 — a
    // per-column fold would nest ~100 Projects; see oneHot)
    df.withColumns(scala.collection.immutable.ListMap(cols.map { c =>
      val (m, s) = statIdx(c)
      c -> (col(c) - m) / s
    }: _*))
  }

  /** sklearn `LabelEncoder` parity: distinct non-null values sorted
    * ascending -> 0..n-1 (reference `getdataset.py:49,342,384-399`;
    * LabelEncoder sorts classes — SURVEY §2.9 F6 notes Spark's
    * StringIndexer defaults to frequency order, so we do NOT use it).
    * One small distinct job; the mapping applies as a codegen'd `when`
    * ladder (class counts are tiny).
    */
  def labelEncode(df: DataFrame, colName: String): DataFrame = {
    // np.unique ordering: numeric columns sort NUMERICALLY (a toString
    // sort would put 10 before 2 and permute every downstream code)
    val values = df.select(colName).distinct().collect()
      .map(_.get(0)).filter(_ != null)
      .sorted(graft.core.DEMV.anyOrdering)
    val ladder = values.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (v, i)) => when(col(colName) === lit(v), i).otherwise(acc)
    }
    df.withColumn(colName, ladder)
  }

  /** sklearn `OrdinalEncoder` parity for multiple columns: per-column
    * alphabetically sorted categories -> 0.0..n-1.0 (doubles, as sklearn
    * returns float64; reference `getdataset.py:50-51`).
    */
  def ordinalEncode(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      val values = acc.select(c).distinct().collect()
        .map(_.get(0)).filter(_ != null)
        .sorted(graft.core.DEMV.anyOrdering) // np.unique order, see labelEncode
      val ladder = values.zipWithIndex.foldLeft(lit(null).cast("double")) {
        case (a, (v, i)) => when(col(c) === lit(v), i.toDouble).otherwise(a)
      }
      acc.withColumn(c, ladder)
    }

  /** pandas `get_dummies` with an EXPLICIT category list — matches dummies
    * of a pandas Categorical (e.g. `cut` output), which emits one column per
    * category even when unobserved (reference `getdataset.py:46-48`).
    */
  def oneHotValues(df: DataFrame, colName: String, values: Seq[String]): DataFrame =
    // one Project, not one per category — see oneHot
    df.withColumns(scala.collection.immutable.ListMap(values.map(v =>
      v -> when(col(colName) === v, 1).otherwise(0)): _*))

  /** Drop columns that are entirely null — one aggregation pass. */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.map(c =>
      sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(c)).toSeq: _*).collect()(0)
    val keep = df.columns.zipWithIndex.collect { case (c, i) if counts.getLong(i) > 0 => c }
    df.select(keep.map(col).toSeq: _*)
  }

  /** Drop columns containing ANY null (reference `getdataset.py:170-171`:
    * `isna().any()` column pruning for the crime dataset) — one pass.
    */
  def dropColumnsWithNulls(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)).toSeq: _*).collect()(0)
    val keep = df.columns.zipWithIndex.collect { case (c, i) if counts.getLong(i) == 0 => c }
    df.select(keep.map(col).toSeq: _*)
  }
}
