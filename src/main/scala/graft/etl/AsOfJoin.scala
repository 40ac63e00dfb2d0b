package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to every left row the most recent right row with
  * `right.ts <= left.ts` within the same partition key — the operator
  * relational engines ship natively (DuckDB `ASOF JOIN`) and Spark lacks.
  *
  * NOT implemented as a range join (quadratic blowup per key) or a
  * per-key collect. Plan: tag and union both sides, then ONE window
  * partitioned by the key, ordered by (ts, side) — right rows sort before
  * left rows at equal timestamps — carrying the right payload forward with
  * `last_value(ignoreNulls)`. One shuffle of (key, ts, payload), linear
  * work, same cost shape as a windowed aggregate at any scale.
  *
  * Right rows must be unique per (key, ts) for deterministic output —
  * pre-aggregate the right side if they are not.
  */
object AsOfJoin {

  /** @param left       rows to enrich (kept in full)
    * @param right      lookup rows: key cols + tsCol + `valueCols`
    * @param keyCols    equi-partition columns present on both sides
    * @param tsCol      ordering column name (numeric or timestamp), both sides
    * @param valueCols  right-side payload columns to attach (null when no
    *                   right row precedes the left row)
    */
  def asofLatest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => valueCols.contains(c)),
      s"value columns ${valueCols.mkString(",")} collide with left columns")
    val sideCol = "__graft_side"
    val payloadCol = "__graft_payload"
    // Carry ONE struct of the payload columns, not per-column last()s: an
    // independent last(ignoreNulls) per value column would back-fill a null
    // in the matched right row from an OLDER row, mixing values across
    // different right rows. The struct is atomic — all payload columns come
    // from the same matched row, and a genuinely-null value there stays
    // null (DuckDB ASOF semantics).
    val payloadType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    val l = left.withColumn(sideCol, lit(1))
      .select(leftCols.map(col) :+ col(sideCol)
        :+ lit(null).cast(payloadType).as(payloadCol): _*)
    val r = right.withColumn(sideCol, lit(0))
      .select(leftCols.map(c =>
        if (keyCols.contains(c) || c == tsCol) col(c) else lit(null).as(c))
        :+ col(sideCol) :+ struct(valueCols.map(col): _*).as(payloadCol): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(sideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(leftCols.map(col) :+ col(sideCol)
        :+ last(col(payloadCol), ignoreNulls = true).over(w).as(payloadCol): _*)
    carried.where(col(sideCol) === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"$payloadCol.$c").as(c)): _*)
  }
}
