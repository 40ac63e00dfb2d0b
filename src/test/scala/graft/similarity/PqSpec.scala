package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val subDim = dim / m

  // clustered synthetic corpus: 6 well-separated centers, 30 points
  // each, deterministic jitter
  private lazy val corpus = {
    val rng = new scala.util.Random(11)
    val centers = Seq.fill(6)(Array.fill(dim)(rng.nextDouble() * 10.0))
    (0 until 180).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(_ + (rng.nextDouble() - 0.5) * 0.2).toSeq)
    }.toDF("vec_id", "v").repartition(5)
  }

  private lazy val cbs = Pq.trainCodebooks(corpus, "vec_id", "v", dim, m, ksub = 8)

  test("codes are in range and deterministic across partitionings") {
    def codesOf(parts: Int) = corpus.repartition(parts)
      .select(col("vec_id"), Pq.encode(col("v"), cbs, dim).as("code"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val a = codesOf(1)
    assert(a === codesOf(7))
    assert(a.values.forall(c => c.length == m && c.forall(x => x >= 0 && x < 8)))
  }

  test("ADC distance equals the hand-computed reconstruction distance") {
    val queries = corpus.where(col("vec_id") === 0L)
    val qv = queries.select(col("v")).collect()(0).getSeq[Double](0).toArray
    val got = Pq.adcTopK(corpus, "vec_id", "v", queries, cbs, dim, k = 179)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // recompute on the driver: code = strict-< argmin per subspace,
    // dist = sum_j ||q_j - centroid_{j, code_j}||^2
    val rows = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    rows.foreach { case (id, v) =>
      if (id != 0L) {
        var total = 0.0
        (0 until m).foreach { j =>
          val cb = cbs(j)
          var bestC = -1
          var bestD = Double.MaxValue
          (0 until cb.length / subDim).foreach { c =>
            var s = 0.0
            (0 until subDim).foreach { i =>
              val d = v(j * subDim + i) - cb(c * subDim + i); s += d * d
            }
            if (s < bestD) { bestD = s; bestC = c }
          }
          var t = 0.0
          (0 until subDim).foreach { i =>
            val d = qv(j * subDim + i) - cbs(j)(bestC * subDim + i); t += d * d
          }
          total += t
        }
        assert(math.abs(got(id) - total) < 1e-9, s"vec $id")
      }
    }
  }

  test("IVF+PQ with all cells probed equals the full PQ scan; fewer probes subset it") {
    val queries = corpus.where(col("vec_id") < 3L)
    val cent = Similarity.trainIvfCentroids(corpus, "vec_id", "v", dim, nLists = 6)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.rint(r.getDouble(3) * 1e9) / 1e9)).toSet
    // probing EVERY cell makes the candidate set the whole corpus, so
    // the composition must reproduce the flat ADC scan exactly
    val full = rows(Pq.adcTopK(corpus, "vec_id", "v", queries, cbs, dim, k = 5))
    val allProbes = rows(Pq.ivfAdcTopK(corpus, "vec_id", "v", queries,
      cent, cbs, dim, k = 5, nProbe = 6))
    assert(allProbes === full)
    // fewer probes: results come from probed cells only, and on this
    // clustered corpus the own-cluster cell is the first probe, so the
    // top-k still matches the flat scan (IVF recall at work)
    val oneProbe = rows(Pq.ivfAdcTopK(corpus, "vec_id", "v", queries,
      cent, cbs, dim, k = 5, nProbe = 1))
    assert(oneProbe === full,
      "clustered queries must recall their own cluster with one probe")
  }

  test("exact rerank over the full ADC candidate set equals brute-force top-k") {
    val queries = corpus.where(col("vec_id") < 2L)
    val got = Pq.adcTopKRefined(corpus, "vec_id", "v", queries, cbs, dim,
        k = 5, rerank = 179)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val all = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val want = all.filter(_._1 < 2L).flatMap { case (qid, qv) =>
      all.filter(_._1 != qid)
        .map { case (id, v) =>
          id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        .sortBy { case (id, d) => (d, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (qid, i + 1, id) }
    }.toSet
    assert(got === want)
  }

  private lazy val cent6 = Similarity.trainIvfCentroids(corpus, "vec_id", "v", dim, nLists = 6)
  private lazy val rcbs = Pq.trainResidualCodebooks(corpus, "vec_id", "v", dim, m,
    centroids = cent6, ksub = 8)

  test("residual ADC distance equals the hand-computed residual reconstruction distance") {
    val queries = corpus.where(col("vec_id") === 0L)
    val qv = queries.select(col("v")).collect()(0).getSeq[Double](0).toArray
    val got = Pq.ivfAdcTopKResidual(corpus, "vec_id", "v", queries,
        cent6, rcbs, dim, k = 179, nProbe = 6)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val centArr = cent6.toArray
    def cellOf(v: Array[Double]): Int = {
      var best = -1; var bestD = Double.MaxValue
      (0 until centArr.length / dim).foreach { c =>
        var s = 0.0
        (0 until dim).foreach { i => val d = v(i) - centArr(c * dim + i); s += d * d }
        if (s < bestD) { bestD = s; best = c }
      }
      best
    }
    val rows = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    rows.foreach { case (id, v) =>
      if (id != 0L) {
        val cell = cellOf(v)
        val rv = v.indices.map(i => v(i) - centArr(cell * dim + i)).toArray
        val qr = qv.indices.map(i => qv(i) - centArr(cell * dim + i)).toArray
        var total = 0.0
        (0 until m).foreach { j =>
          val cb = rcbs(j)
          var bestC = -1
          var bestD = Double.MaxValue
          (0 until cb.length / subDim).foreach { c =>
            var s = 0.0
            (0 until subDim).foreach { i =>
              val d = rv(j * subDim + i) - cb(c * subDim + i); s += d * d
            }
            if (s < bestD) { bestD = s; bestC = c }
          }
          var t = 0.0
          (0 until subDim).foreach { i =>
            val d = qr(j * subDim + i) - cb(bestC * subDim + i); t += d * d
          }
          total += t
        }
        assert(math.abs(got(id) - total) < 1e-9, s"vec $id")
      }
    }
  }

  test("residual IVF+PQ + full-width exact rerank equals brute-force top-k") {
    val queries = corpus.where(col("vec_id") < 2L)
    val got = Pq.ivfAdcTopKResidualRefined(corpus, "vec_id", "v", queries,
        cent6, rcbs, dim, k = 5, nProbe = 6, rerank = 179)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val all = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val want = all.filter(_._1 < 2L).flatMap { case (qid, qv) =>
      all.filter(_._1 != qid)
        .map { case (id, v) =>
          id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        .sortBy { case (id, d) => (d, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (qid, i + 1, id) }
    }.toSet
    assert(got === want)
  }

  test("chunked residual-ADC query batches equal the unchunked plan bit-for-bit") {
    // the table-literal bound: per-query block is nProbe x m x ksub
    // doubles; a cap of exactly one query's block forces one plan per
    // query (5 chunks here), and the union must be BIT-identical to the
    // single-plan run — queries are independent and each chunk's tables
    // come from the same driver loop
    val queries = corpus.where(col("vec_id") < 5L)
    val perQuery = 6L * m * 8 // nProbe x m x ksub
    def run(cap: Long) = Pq.ivfAdcTopKResidual(corpus, "vec_id", "v", queries,
        cent6, rcbs, dim, k = 7, nProbe = 6, maxTableDoubles = cap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val unchunked = run(1L << 23)
    val chunked = run(perQuery)
    assert(chunked === unchunked)
    // exact-double comparison included above via getDouble equality
    val tooSmall = intercept[IllegalArgumentException](run(perQuery - 1))
    assert(tooSmall.getMessage.contains("cannot hold even one query"))
  }

  test("pqAdcDistAt validates the table index (public join column)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val codes = ArrayData.toArrayData(Array(0L, 0L, 0L, 0L))
    val tables = Array.fill(2 * 4 * 8)(1.0) // 2 packed tables at m=4, ksub=8
    assert(graft.functions.TextAlgo.pqAdcDistAt(codes, tables, 4, 8, 0L) === 4.0)
    assert(graft.functions.TextAlgo.pqAdcDistAt(codes, tables, 4, 8, 1L) === 4.0)
    Seq(2L, -1L, (1L << 32) + 1L).foreach { bad =>
      val e = intercept[IllegalArgumentException](
        graft.functions.TextAlgo.pqAdcDistAt(codes, tables, 4, 8, bad))
      assert(e.getMessage.contains("out of range"), s"idx $bad")
    }
  }

  test("residual codes micro-rank inside a cell where raw codes collapse") {
    // raw-vector PQ collapses a tight cluster onto one code word, so
    // WITHIN the query's cluster every member ties at the same ADC
    // distance; residual codes describe v - centroid(cell) and keep
    // resolution at the jitter scale. Measured as top-10 recall vs
    // brute-force ground truth over the cluster members.
    val queries = corpus.where(col("vec_id") < 3L)
    val all = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val truth = all.filter(_._1 < 3L).flatMap { case (qid, qv) =>
      all.filter(_._1 != qid)
        .map { case (id, v) =>
          id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        .sortBy { case (id, d) => (d, id) }.take(10)
        .map { case (id, _) => (qid, id) }
    }.toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (got & truth).size.toDouble / truth.size
    }
    val raw = recall(Pq.ivfAdcTopK(corpus, "vec_id", "v", queries,
      cent6, cbs, dim, k = 10, nProbe = 6))
    val res = recall(Pq.ivfAdcTopKResidual(corpus, "vec_id", "v", queries,
      cent6, rcbs, dim, k = 10, nProbe = 6))
    assert(res > raw, s"residual recall $res must beat raw-code recall $raw")
    assert(res >= 0.5, s"residual recall $res below 0.5 on the 6-cluster fixture")
  }

  test("PQ top-k discriminates clusters (the resolution PQ promises)") {
    // within a tight cluster, quantization collapses members onto the
    // same code, so intra-cluster micro-ranking is tie-broken by id —
    // NOT a defect (reconstruction distance is exact per code, proved
    // above). What PQ must deliver is CLUSTER discrimination: every
    // top-k neighbor of a query comes from the query's own cluster
    // (clusters sit ~10 units apart, jitter is 0.2).
    val queries = corpus.where(col("vec_id") < 3L)
    val pq = Pq.adcTopK(corpus, "vec_id", "v", queries, cbs, dim, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, a) => q -> a.map(_._2).toSet }
    (0L until 3L).foreach { qid =>
      assert(pq(qid).size === 10)
      assert(pq(qid).forall(n => n % 6 == qid % 6),
        s"query $qid pulled a neighbor from a foreign cluster: ${pq(qid)}")
    }
    // and the ranking is strictly non-decreasing in adc_dist per query
    val ranked = Pq.adcTopK(corpus, "vec_id", "v", queries, cbs, dim, k = 10)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    ranked.groupBy(_._1).values.foreach { rs =>
      val ds = rs.sortBy(_._2).map(_._3)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }
}
