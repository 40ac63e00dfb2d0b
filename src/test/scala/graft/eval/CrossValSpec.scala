package graft.eval

import graft.SparkSpec
import graft.data.{DatasetSpec, Generator}
import org.apache.spark.sql.functions._

class CrossValSpec extends SparkSpec {

  private lazy val spec: DatasetSpec = {
    val df = Generator.classification(spark, 600, nFeatures = 6, nClasses = 2,
      nInformative = 4, nSensitive = 2, seed = 9)
    DatasetSpec(df, "y", 1, Seq("s1", "s2"), Map("s1" -> 0, "s2" -> 0), 10)
  }

  test("withFolds: deterministic near-equal k-way split") {
    val f = CrossVal.withFolds(spec.df, 5)
    val sizes = f.groupBy("__fold").count().collect().map(_.getLong(1))
    assert(sizes.length === 5)
    assert(sizes.min > 60) // 600/5 = 120 expected; hash split stays near
    val again = CrossVal.withFolds(spec.df, 5).groupBy("__fold").count()
      .collect().map(_.getLong(1)).toSeq
    assert(again.sorted === sizes.toSeq.sorted)
  }

  test("withFolds idCols: duplicates co-fold by default, spread with an id") {
    import spark.implicits._
    val dup = Seq.fill(40)((1, 2.0)).zipWithIndex.map { case ((a, b), i) => (a, b, i) }
      .toDF("a", "b", "id")
    // hashing only the duplicated payload puts everything in ONE fold
    val payloadFolds = CrossVal.withFolds(dup.select("a", "b"), 4)
      .select("__fold").distinct().count()
    assert(payloadFolds === 1)
    // an id column spreads them
    val idFolds = CrossVal.withFolds(dup, 4, idCols = Some(Seq("id")))
      .select("__fold").distinct().count()
    assert(idFolds > 1)
  }

  test("biased logistic CV: one row per fold, learnable accuracy") {
    val rows = CrossVal.crossVal(spec, "logistic", method = "biased", k = 3)
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.acc > 0.6, s"informative features should beat chance, got ${r.acc}")
      assert(!r.statPar.isNaN && !r.eqOdds.isNaN && !r.dispImp.isNaN)
    }
  }

  test("demv-in-the-loop CV runs and keeps metrics finite") {
    val rows = CrossVal.crossVal(spec, "logistic", method = "demv", k = 2)
    assert(rows.length === 2)
    rows.foreach(r => assert(r.acc > 0.5))
  }

  test("gradient classifier (binary GBT) works in the pipeline") {
    val rows = CrossVal.crossVal(spec, "gradient", method = "biased", k = 2)
    assert(rows.length === 2)
    rows.foreach(r => assert(r.acc > 0.6))
  }

  test("writeMetrics uses the reference naming contract") {
    val rows = Seq(MetricRow(0, 10, -0.1, 0.2, 0.3, 0.9, 0.8))
    val path = CrossVal.writeMetrics(spark, rows, "/tmp/graft_ris", "synt", "uniform", 2, "logistic")
    assert(path.endsWith("2features/metrics_synt_uniform_2_features_logistic.csv"))
    val back = spark.read.option("header", true).csv(path)
    assert(back.columns.toSeq === Seq("stat_par", "eq_odds", "zero_one_loss", "disp_imp", "acc"))
    assert(back.count() === 1)
  }
}
