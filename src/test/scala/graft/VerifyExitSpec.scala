package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Verify.shouldFailRun]] — the exit policy added for ADVICE r11
  * #3. The negative path (undeclared failure → nonzero exit) is the guard
  * against the r11 breakage class and never executes in a green sweep, so
  * it needs a direct test.
  */
class VerifyExitSpec extends AnyFunSuite {

  test("no failures → clean exit, with or without a declaration") {
    assert(!Verify.shouldFailRun(Nil, None))
    assert(!Verify.shouldFailRun(Nil, Some("agg_skew,agg_stats")))
  }

  test("any undeclared failure fails the run") {
    assert(Verify.shouldFailRun(Seq("join_asof"), None))
    assert(Verify.shouldFailRun(Seq("agg_skew", "join_asof"),
      Some("agg_skew")), "one declared + one undeclared must still fail")
  }

  test("failures fully covered by the declaration are forgiven") {
    assert(!Verify.shouldFailRun(Seq("agg_skew", "agg_stats"),
      Some("agg_skew,agg_stats,win_rolling_std")))
  }

  test("declaration parsing: whitespace and empty segments are tolerated") {
    assert(!Verify.shouldFailRun(Seq("agg_skew"),
      Some(" agg_skew , ,agg_stats,")))
    assert(Verify.shouldFailRun(Seq("agg_skew"), Some("")),
      "an empty declaration declares nothing")
  }
}
