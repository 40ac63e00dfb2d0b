package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KmeansProfileSpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated 4-d blobs
  private def corpus = {
    val rng = new scala.util.Random(7)
    val rows = (0 until 100).map { i =>
      val base = if (i % 2 == 0) Array(10.0, 10.0, 10.0, 10.0) else Array(-10.0, -10.0, -10.0, -10.0)
      (i.toLong, base.map(_ + rng.nextGaussian() * 0.1).toSeq)
    }
    rows.toDF("id", "v")
  }

  test("profile covers the corpus and separates obvious blobs") {
    val (cent, prof) = Similarity.kmeansClusterProfile(corpus, "id", "v", dim = 4, k = 2)
    assert(cent.length == 8)
    val rows = prof.orderBy("cell").collect()
    assert(rows.map(_.getLong(1)).sum == 100L)
    assert(rows.length == 2)
    // tight blobs: every vector lands within ~1 of its centroid
    assert(rows.forall(_.getDouble(2) < 1.0))
  }

  test("training and profile are deterministic") {
    val (c1, p1) = Similarity.kmeansClusterProfile(corpus, "id", "v", dim = 4, k = 2)
    val (c2, p2) = Similarity.kmeansClusterProfile(corpus, "id", "v", dim = 4, k = 2)
    assert(c1 == c2)
    assert(p1.collect().map(_.toSeq).toSeq == p2.collect().map(_.toSeq).toSeq)
  }
}
