package graft.eval

import graft.SparkSpec
import graft.data.Datasets

/** End-to-end replication check on adult — the largest reference dataset
  * (32,561 raw rows, Black/White filter, binary label) and the one with the
  * widest one-hot tower (~100 dummy columns), i.e. the dataset that exposed
  * the constraint-propagation optimizer blowup fixed in round 3.
  *
  * The reference's replication package publishes NO adult result CSVs
  * (`replication_package/ris/2features/` holds only cmc), so unlike
  * `BaselineBandsSpec` there are no reference bands to diff against.
  * Instead this spec pins the stack to (a) public-knowledge performance of
  * standardized logistic regression on UCI adult (accuracy ~0.80-0.85 is
  * reported across the literature for this feature set) and (b) the
  * reference method's own contract (`demv` reduces the absolute statistical
  * parity of the biased model at convergence while keeping accuracy close
  * — the claim of the DEMV paper the reference implements).
  *
  * Diagnostic means are printed via `info()` so future band tightening has
  * committed evidence.
  */
class AdultBandsSpec extends SparkSpec {

  private val dataDir = "/root/reference/replication_package/data"
  private def available = new java.io.File(s"$dataDir/adult.data").length() > 1000

  private def mean(xs: Seq[Double]) = xs.sum / xs.length

  // Compute both matrices once; both tests read from here. k=10 matches the
  // reference CV protocol (`utils.py:136` KFold n_splits=10).
  private lazy val (biased, demv) = {
    val spec = Datasets.adult(spark, s"$dataDir/adult.data", numberOfFeatures = 2)
    val b = CrossVal.crossVal(spec, "logistic", method = "biased", k = 10)
    val d = CrossVal.crossVal(spec, "logistic", method = "demv", k = 10)
    (b, d)
  }

  test("adult biased/logistic: accuracy and parity direction match public knowledge") {
    assume(available, "adult.data not present in this container")
    val acc = mean(biased.map(_.acc))
    val statPar = mean(biased.map(_.statPar))
    val dispImp = mean(biased.map(_.dispImp))
    info(f"biased: acc=$acc%.4f stat_par=$statPar%.4f disp_imp=$dispImp%.4f")
    // Public band: standardized logistic on UCI adult sits at 0.80-0.85
    // accuracy; allow slack for the Black/White filter + hash-fold split.
    assert(acc >= 0.78 && acc <= 0.88, s"acc $acc outside public adult band")
    // Discrimination direction is robustly documented: the unprivileged
    // (female & non-White) group receives far fewer positive predictions.
    assert(statPar < -0.05, s"stat_par $statPar not materially negative")
    assert(dispImp > 0.0 && dispImp < 1.0, s"disp_imp $dispImp not in (0,1)")
  }

  test("adult demv/logistic: balancing shrinks |stat_par| and keeps accuracy close") {
    assume(available, "adult.data not present in this container")
    val bStat = mean(biased.map(_.statPar))
    val dStat = mean(demv.map(_.statPar))
    val bAcc = mean(biased.map(_.acc))
    val dAcc = mean(demv.map(_.acc))
    info(f"demv: acc=$dAcc%.4f stat_par=$dStat%.4f (biased acc=$bAcc%.4f stat_par=$bStat%.4f)")
    // The DEMV contract at convergence (stop beyond max iters): absolute
    // statistical parity drops materially vs the biased model...
    assert(math.abs(dStat) < math.abs(bStat) * 0.8,
      s"demv |stat_par| ${math.abs(dStat)} did not shrink vs biased ${math.abs(bStat)}")
    // ...without collapsing accuracy (paper reports low single-digit cost).
    assert(dAcc >= bAcc - 0.05, s"demv acc $dAcc collapsed vs biased $bAcc")
  }

  // E7 fidelity on the widest one-hot tower: the reductions retrain a
  // logistic learner 5x per fold (EG rounds / grid points), so these run at
  // k=5 to bound wall time; the biased yardstick is recomputed at the SAME
  // fold count so the comparison is apples-to-apples. No published adult
  // CSVs exist (see header), so the bands are the methods' own contracts.
  private lazy val (biased5, eg5, grid5) = {
    val spec = Datasets.adult(spark, s"$dataDir/adult.data", numberOfFeatures = 2)
    val b = CrossVal.crossVal(spec, "logistic", method = "biased", k = 5)
    val e = CrossVal.crossVal(spec, "logistic", method = "eg", k = 5)
    val g = CrossVal.crossVal(spec, "logistic", method = "grid", k = 5)
    (b, e, g)
  }

  test("adult eg/logistic: bounded group loss without losing accuracy or parity ground") {
    assume(available, "adult.data not present in this container")
    val bAcc = mean(biased5.map(_.acc)); val eAcc = mean(eg5.map(_.acc))
    val bStat = mean(biased5.map(_.statPar)); val eStat = mean(eg5.map(_.statPar))
    info(f"eg: acc=$eAcc%.4f stat_par=$eStat%.4f (biased acc=$bAcc%.4f stat_par=$bStat%.4f)")
    // EG constrains per-group 0-1 loss, not parity directly (cmc moved
    // stat_par only -0.126 -> -0.107): the contract is accuracy stays close
    // and parity does not materially worsen.
    assert(eAcc >= bAcc - 0.05, s"eg acc $eAcc collapsed vs biased $bAcc")
    assert(eAcc >= 0.70, s"eg acc $eAcc below any published adult figure")
    assert(math.abs(eStat) <= math.abs(bStat) + 0.05,
      s"eg |stat_par| ${math.abs(eStat)} materially worse than biased ${math.abs(bStat)}")
  }

  test("adult grid/logistic: loss-constrained selection keeps accuracy and parity ground") {
    assume(available, "adult.data not present in this container")
    val bAcc = mean(biased5.map(_.acc)); val gAcc = mean(grid5.map(_.acc))
    val bStat = mean(biased5.map(_.statPar)); val gStat = mean(grid5.map(_.statPar))
    info(f"grid: acc=$gAcc%.4f stat_par=$gStat%.4f (biased acc=$bAcc%.4f stat_par=$bStat%.4f)")
    // The reference's GridSearch constrains per-group 0-1 LOSS
    // (BoundedGroupLoss, `generatemetrics.py:116-120`), not parity: cmc's
    // published parity shrink (-0.126 -> -0.012) is dataset-specific, not a
    // method guarantee. On adult the loss-minimizing grid point is near the
    // unweighted model (measured: both parities within 0.002), so the
    // contract to pin is accuracy parity with biased and no material
    // parity regression — same shape as the EG test above.
    assert(gAcc >= bAcc - 0.10, s"grid acc $gAcc collapsed vs biased $bAcc")
    assert(gAcc >= 0.70, s"grid acc $gAcc below any published adult figure")
    assert(math.abs(gStat) <= math.abs(bStat) + 0.05,
      s"grid |stat_par| ${math.abs(gStat)} materially worse than biased ${math.abs(bStat)}")
  }
}
