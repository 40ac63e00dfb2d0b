package graft.eval

import graft.SparkSpec
import graft.data.Datasets

/** End-to-end replication check against BASELINE.md's published cmc bands
  * (2 sensitive features, logistic, 10-fold). The published numbers are
  * stochastic single-run artifacts, so BASELINE.md's own rule applies:
  * compare means within ~2 pooled standard deviations, not exact goldens.
  */
class BaselineBandsSpec extends SparkSpec {

  private val dataDir = "/root/reference/replication_package/data"
  private def available = new java.io.File(s"$dataDir/cmc.data").length() > 1000

  private def mean(xs: Seq[Double]) = xs.sum / xs.length

  test("cmc biased/logistic: stat_par and acc inside the published bands") {
    assume(available, "cmc.data not present in this container")
    val spec = Datasets.cmc(spark, s"$dataDir/cmc.data", numberOfFeatures = 2)
    val rows = CrossVal.crossVal(spec, "logistic", method = "biased", k = 10)
    val statPar = mean(rows.map(_.statPar))
    val acc = mean(rows.map(_.acc))
    // BASELINE.md: stat_par -0.126 +- 0.032, acc 0.521 +- 0.038 (2 std)
    assert(math.abs(statPar - (-0.126)) <= 2 * 0.032, s"stat_par $statPar")
    assert(math.abs(acc - 0.521) <= 2 * 0.038, s"acc $acc")
  }

  test("cmc eg/logistic (randomized ensemble): stat_par and acc inside the published bands") {
    assume(available, "cmc.data not present in this container")
    val spec = Datasets.cmc(spark, s"$dataDir/cmc.data", numberOfFeatures = 2)
    val rows = CrossVal.crossVal(spec, "logistic", method = "eg", k = 10)
    val statPar = mean(rows.map(_.statPar))
    val acc = mean(rows.map(_.acc))
    // BASELINE.md: eg/logistic stat_par -0.107 +- 0.043, acc 0.509 +- 0.033
    // (2 std; the ensemble's per-row draws add their own variance on top of
    // fairlearn's, hence the band rule rather than exact goldens)
    assert(math.abs(statPar - (-0.107)) <= 2 * 0.043, s"stat_par $statPar")
    assert(math.abs(acc - 0.509) <= 2 * 0.033, s"acc $acc")
  }

  test("cmc grid/logistic: stat_par and acc inside the published bands") {
    assume(available, "cmc.data not present in this container")
    val spec = Datasets.cmc(spark, s"$dataDir/cmc.data", numberOfFeatures = 2)
    val rows = CrossVal.crossVal(spec, "logistic", method = "grid", k = 10)
    val statPar = mean(rows.map(_.statPar))
    val acc = mean(rows.map(_.acc))
    // BASELINE.md: grid/logistic stat_par -0.012 +- 0.091, acc 0.445 +- 0.046
    // (2 std). Grid's published stat_par band is wide — fairlearn's grid
    // searches the full multiplier simplex while ours walks the 1-D
    // unpriv-axis slice, but both land the parity near zero, which is the
    // observable the band actually constrains.
    assert(math.abs(statPar - (-0.012)) <= 2 * 0.091, s"stat_par $statPar")
    assert(math.abs(acc - 0.445) <= 2 * 0.046, s"acc $acc")
  }
}
