package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.ByteBpe

/** Persistable TRAINED-MODEL artifacts — the train-once / score-many
  * contract every production pipeline needs ([[graft.dedup.DedupState]]
  * generalized from dedup state to the trained operators).
  *
  * A 100 TB deployment trains its models ONCE — PQ/OPQ codebooks on a
  * bounded sample, the byte-BPE vocabulary on one crawl, the KenLM-shape
  * n-gram model on a reference corpus — and scores every later crawl
  * against the saved artifact; re-training in-query would re-pay the
  * training scans per run AND silently change scores between runs. Each
  * artifact here is:
  *
  *  - **schema-pinned**: a fixed parquet schema, checked on save AND
  *    load (name + type shape; parquet legitimately flips nullability);
  *  - **param-stamped**: the hyper-parameters that make the artifact
  *    meaningful (dim/m/ksub for PQ, the n-gram order and tokenizer
  *    tier for LM models) are written into every row, and a load with
  *    mismatched expectations REFUSES loudly instead of scoring with
  *    the wrong geometry;
  *  - **bit-faithful**: doubles/longs/strings round-trip parquet
  *    exactly, and rows are reassembled in their pinned order — so
  *    save -> load -> score equals train -> score BIT-IDENTICALLY
  *    (spec-pinned in `ModelStateSpec`).
  *
  * All artifacts are tiny next to the corpus (a PQ model is
  * nLists x dim + m x ksub x subDim doubles; an LM model is maxGrams
  * rows; a BPE vocabulary is numMerges + specials rows), so save/load
  * cost is negligible and the artifacts can ship with job configs.
  */
object ModelState {

  // ---- bounded hashed n-gram LM (UnigramLm.trainNgramModelHashed) ----

  /** Schema contract for the LM artifact: the (g, prob, unseen_prob)
    * scoring table with the n-gram order and tokenizer tier stamped
    * into every row.
    */
  val LmStateSchema: StructType = StructType(Seq(
    StructField("g", LongType, nullable = false),
    StructField("prob", DoubleType, nullable = false),
    StructField("unseen_prob", DoubleType, nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("unicode", BooleanType, nullable = false)))

  /** Persist a bounded hashed n-gram model
    * ([[graft.text.UnigramLm.trainNgramModelHashed]]'s (g, prob,
    * unseen_prob) frame — a captured-gram frame's extra column is
    * dropped). The order `n` and tokenizer tier are stamped so a
    * mismatched scorer cannot silently consume it: the g keys are
    * n-gram chain hashes, and an order-3 model joined against an
    * order-5 stream would score everything at the unseen floor.
    */
  def saveLmModel(model: DataFrame, n: Int, unicode: Boolean, path: String): Unit = {
    require(n >= 2, s"hashed n-gram models have order >= 2, got $n")
    val stamped = model
      .select(col("g").cast("long").as("g"), col("prob"), col("unseen_prob"),
        lit(n).as("n"), lit(unicode).as("unicode"))
    requireSchema(stamped.schema, LmStateSchema, "lm model")
    stamped.write.mode("overwrite").parquet(path)
  }

  /** Load an LM artifact, checking the schema contract and that the
    * stamped order/tier match the caller's — returns the (g, prob,
    * unseen_prob) frame [[graft.text.UnigramLm.scoreNgramsWithModel]]
    * broadcasts.
    */
  def loadLmModel(spark: SparkSession, path: String, n: Int,
      unicode: Boolean = false): DataFrame = {
    val df = spark.read.parquet(path)
    requireSchema(df.schema, LmStateSchema, s"lm model at $path")
    val wrong = df.where(col("n") =!= n || col("unicode") =!= unicode).limit(1).count()
    require(wrong == 0,
      s"lm model at $path was trained at a different order/tier than (n=$n, unicode=$unicode)")
    df.select(col("g"), col("prob"), col("unseen_prob"))
  }

  // ---- PQ / residual-IVFPQ models (Pq.trainCodebooks + IVF centroids) ----

  /** Schema contract for the PQ artifact: one vector per row —
    * `part` = "centroid" (idx = cell, code = -1) or "codebook"
    * (idx = subspace j, code = c) — with (dim, m, ksub) stamped into
    * every row. A flat-PQ model (no coarse quantizer) simply has zero
    * centroid rows.
    */
  val PqStateSchema: StructType = StructType(Seq(
    StructField("part", StringType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("dim", IntegerType, nullable = false),
    StructField("m", IntegerType, nullable = false),
    StructField("ksub", IntegerType, nullable = false)))

  /** Persist a PQ model: IVF centroids (row-major nLists x dim — empty
    * for flat PQ) + the m per-subspace codebooks (each ksub x subDim).
    * Works identically for raw-vector and residual codebooks — the
    * residual convention lives in how the model is USED (score residuals
    * vs raw vectors), not in the artifact.
    */
  def savePqModel(spark: SparkSession, path: String,
      centroids: Seq[Double], codebooks: Seq[Seq[Double]], dim: Int): Unit = {
    val m = codebooks.length
    require(m > 0 && dim % m == 0, s"dim $dim must be a multiple of m $m")
    val subDim = dim / m
    val ksub = codebooks.head.length / subDim
    require(codebooks.forall(_.length == ksub * subDim),
      "all codebooks must hold ksub x subDim values")
    require(centroids.length % dim == 0,
      s"centroids must be row-major nLists x dim (got ${centroids.length} doubles at dim $dim)")
    import spark.implicits._
    val centRows = centroids.grouped(dim).zipWithIndex.map { case (c, i) =>
      ("centroid", i, -1, c)
    }.toSeq
    val cbRows = codebooks.zipWithIndex.flatMap { case (cb, j) =>
      (0 until ksub).map { c =>
        ("codebook", j, c, cb.slice(c * subDim, (c + 1) * subDim))
      }
    }
    val stamped = (centRows ++ cbRows).toDF("part", "idx", "code", "v")
      .select(col("part"), col("idx"), col("code"), col("v"),
        lit(dim).as("dim"), lit(m).as("m"), lit(ksub).as("ksub"))
    requireSchema(stamped.schema, PqStateSchema, "pq model")
    stamped.write.mode("overwrite").parquet(path)
  }

  /** Load a PQ artifact, refusing a (dim, m, ksub) mismatch — wrong
    * geometry must never silently produce wrong distances. Returns
    * (centroids row-major — empty for flat PQ, codebooks) exactly as
    * saved, reassembled in pinned (idx, code) order so every double is
    * the trained one.
    */
  def loadPqModel(spark: SparkSession, path: String,
      dim: Int, m: Int, ksub: Int): (Seq[Double], Seq[Seq[Double]]) = {
    val df = spark.read.parquet(path)
    requireSchema(df.schema, PqStateSchema, s"pq model at $path")
    val wrong = df.where(col("dim") =!= dim || col("m") =!= m || col("ksub") =!= ksub)
      .limit(1).count()
    require(wrong == 0,
      s"pq model at $path was trained at different (dim, m, ksub) than ($dim, $m, $ksub)")
    val subDim = dim / m
    val rows = df.select(col("part"), col("idx"), col("code"), col("v"))
      .collect()
    val centRows = rows.filter(_.getString(0) == "centroid").sortBy(_.getInt(1))
    require(centRows.forall(_.getSeq[Double](3).length == dim),
      s"pq model at $path has a centroid of the wrong width")
    val cents = centRows.flatMap(_.getSeq[Double](3))
    val cbRows = rows.filter(_.getString(0) == "codebook")
    val codebooks = (0 until m).map { j =>
      val mine = cbRows.filter(_.getInt(1) == j).sortBy(_.getInt(2))
      require(mine.length == ksub,
        s"pq model at $path: subspace $j holds ${mine.length} codes, want $ksub")
      require(mine.forall(_.getSeq[Double](3).length == subDim),
        s"pq model at $path: subspace $j has a code vector of the wrong width")
      mine.flatMap(_.getSeq[Double](3)).toSeq
    }
    (cents.toSeq, codebooks)
  }

  // ---- OPQ rotation (Opq.trainRotation) ----

  /** Schema contract for the rotation artifact: one matrix ROW per
    * parquet row, the dimension stamped.
    */
  val RotationStateSchema: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("dim", IntegerType, nullable = false)))

  /** Persist a row-major dim x dim OPQ rotation. The orthogonality the
    * trainer guarantees survives verbatim (parquet doubles are exact).
    */
  def saveRotation(spark: SparkSession, path: String, r: Seq[Double], dim: Int): Unit = {
    require(r.length == dim * dim,
      s"rotation must be row-major $dim x $dim, got ${r.length} doubles")
    import spark.implicits._
    val stamped = r.grouped(dim).zipWithIndex
      .map { case (row, i) => (i, row) }.toSeq
      .toDF("i", "v")
      .select(col("i"), col("v"), lit(dim).as("dim"))
    requireSchema(stamped.schema, RotationStateSchema, "rotation")
    stamped.write.mode("overwrite").parquet(path)
  }

  /** Load a rotation artifact, refusing a dimension mismatch; returns
    * the row-major matrix bit-identical to the saved one.
    */
  def loadRotation(spark: SparkSession, path: String, dim: Int): Seq[Double] = {
    val df = spark.read.parquet(path)
    requireSchema(df.schema, RotationStateSchema, s"rotation at $path")
    val wrong = df.where(col("dim") =!= dim).limit(1).count()
    require(wrong == 0, s"rotation at $path was trained at a different dim than $dim")
    val rows = df.select(col("i"), col("v")).collect().sortBy(_.getInt(0))
    require(rows.length == dim, s"rotation at $path holds ${rows.length} rows, want $dim")
    require(rows.forall(_.getSeq[Double](1).length == dim),
      s"rotation at $path has a row of the wrong width")
    rows.flatMap(_.getSeq[Double](1)).toSeq
  }

  // ---- byte-level BPE vocabulary (ByteBpe.train) ----

  /** Schema contract for the byte-BPE artifact: ordered merges
    * (`kind` = "merge": rank, left, right) and ordered specials
    * (`kind` = "special": rank = position, left = the literal token,
    * right = ""). Order IS the model — merge rank determines both the
    * application order and the token ids, and special ids follow the
    * specials' positions — so both sections persist their positions
    * explicitly.
    */
  val ByteBpeStateSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("rank", IntegerType, nullable = false),
    StructField("left", StringType, nullable = false),
    StructField("right", StringType, nullable = false)))

  /** Persist a trained byte-BPE vocabulary. */
  def saveByteBpe(spark: SparkSession, path: String, model: ByteBpe.Model): Unit = {
    import spark.implicits._
    val mergeRows = model.merges.zipWithIndex.map { case ((l, r), i) => ("merge", i, l, r) }
    val specialRows = model.specials.zipWithIndex.map { case (s, j) => ("special", j, s, "") }
    val stamped = (mergeRows ++ specialRows).toDF("kind", "rank", "left", "right")
    requireSchema(stamped.schema, ByteBpeStateSchema, "byte-bpe vocabulary")
    stamped.write.mode("overwrite").parquet(path)
  }

  /** Load a byte-BPE vocabulary artifact; the reconstructed model's
    * vocabulary table (token ids included) is identical to the trained
    * one because both sections come back in their pinned rank order.
    */
  def loadByteBpe(spark: SparkSession, path: String): ByteBpe.Model = {
    val df = spark.read.parquet(path)
    requireSchema(df.schema, ByteBpeStateSchema, s"byte-bpe vocabulary at $path")
    val rows = df.collect()
    val merges = rows.filter(_.getString(0) == "merge")
      .sortBy(_.getInt(1))
      .map(r => (r.getString(2), r.getString(3))).toSeq
    val specials = rows.filter(_.getString(0) == "special")
      .sortBy(_.getInt(1))
      .map(_.getString(2)).toSeq
    val ranks: Seq[Int] = rows.filter(_.getString(0) == "merge").map(_.getInt(1)).sorted.toSeq
    require(ranks == ranks.indices.toList,
      s"byte-bpe vocabulary at $path has non-contiguous merge ranks")
    ByteBpe.Model(merges, specials)
  }

  private def requireSchema(got: StructType, want: StructType, what: String): Unit = {
    // compare names + type SHAPES only: parquet roundtrips legitimately
    // flip nullability flags (field nullable, array containsNull) —
    // the DedupState convention
    val gotNorm = got.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    val wantNorm = want.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    require(gotNorm == wantNorm,
      s"$what schema mismatch: got ${got.simpleString}, want ${want.simpleString}")
  }
}
