package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench calibration-anchor plumbing (round 19, VERDICT
  * r18 #2): the headline calib_sec/io_sec must read -1.0 ("anchor
  * unavailable") when EITHER endpoint rep degraded to the -1.0
  * failure sentinel — never the mean of a healthy value and a
  * sentinel, which is a plausible-looking garbage number that poisons
  * the cross-run normalization the anchor exists for. No Spark
  * session needed: combineAnchors is pure.
  */
class BenchAnchorSpec extends AnyFunSuite {

  test("two healthy endpoints average") {
    assert(Bench.combineAnchors(0.8, 1.2) === 1.0)
    assert(Bench.combineAnchors(0.997, 0.997) === 0.997)
  }

  test("a failed START endpoint yields -1.0, not (healthy + -1)/2") {
    assert(Bench.combineAnchors(-1.0, 0.9) === -1.0)
  }

  test("a failed END endpoint yields -1.0, not (healthy + -1)/2") {
    assert(Bench.combineAnchors(0.9, -1.0) === -1.0)
  }

  test("both endpoints failed yields -1.0") {
    assert(Bench.combineAnchors(-1.0, -1.0) === -1.0)
  }
}
