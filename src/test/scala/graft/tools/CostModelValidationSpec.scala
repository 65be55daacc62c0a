package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The Spearman kernel under tools/CostModelValidation — hand-checked
  * values including the tie-handling path. */
class CostModelValidationSpec extends AnyFunSuite {

  test("perfect monotone agreement is +1, reversal is -1") {
    assert(math.abs(CostModelValidation.spearman(
      Seq(1.0, 2.0, 3.0, 4.0), Seq(10.0, 20.0, 30.0, 40.0)) - 1.0) < 1e-12)
    assert(math.abs(CostModelValidation.spearman(
      Seq(1.0, 2.0, 3.0, 4.0), Seq(40.0, 30.0, 20.0, 10.0)) + 1.0) < 1e-12)
  }

  test("hand-computed example with a swap") {
    // ranks x: 1,2,3,4 ; y: 1,2,4,3 -> rho = 1 - 6*2/(4*15) = 0.8
    val rho = CostModelValidation.spearman(
      Seq(1.0, 2.0, 3.0, 4.0), Seq(5.0, 6.0, 9.0, 8.0))
    assert(math.abs(rho - 0.8) < 1e-12)
  }

  test("ties get average ranks; constant side yields 0") {
    // x has a tie at the bottom: ranks 1.5, 1.5, 3
    val rho = CostModelValidation.spearman(
      Seq(1.0, 1.0, 2.0), Seq(1.0, 2.0, 3.0))
    // ranks x = (1.5, 1.5, 3), y = (1, 2, 3): rho = sqrt(3)/2
    assert(math.abs(rho - math.sqrt(3) / 2) < 1e-12)
    assert(CostModelValidation.spearman(
      Seq(2.0, 2.0, 2.0), Seq(1.0, 2.0, 3.0)) === 0.0)
  }
}
