package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q204's corpus-adaptive fit modulus: the PCA fit keeps ~215
  * series at any corpus size, floored at the historical 1-in-7 so the
  * verify/bench corpora (U ≤ 1505) are bit-identical to the pre-cap
  * behavior.
  */
class FitModulusSpec extends AnyFunSuite {

  test("fitModulus floors at 7 through the verify/bench corpora") {
    assert(ExtraQueries.fitModulus(150) == 7)   // sf0.01
    assert(ExtraQueries.fitModulus(1500) == 7)  // sf0.1
    assert(ExtraQueries.fitModulus(1505) == 7)  // 7·215 boundary
    assert(ExtraQueries.fitModulus(1506) == 8)
  }

  test("fitModulus caps the fit sample at ~215 users past the floor") {
    for (u <- Seq(15000L, 45000L, 150000L, 1500000L)) {
      val m = ExtraQueries.fitModulus(u)
      val fitUsers = u.toDouble / m
      assert(fitUsers <= 215.0 + 1e-9, s"U=$u mod=$m keeps $fitUsers users")
      assert(fitUsers >= 100.0, s"U=$u mod=$m prunes to only $fitUsers users")
    }
  }

  test("fitModulus is monotone in U") {
    val us = (1L to 2000000L by 9973L)
    val ms = us.map(ExtraQueries.fitModulus(_))
    assert(ms == ms.sorted)
  }
}
