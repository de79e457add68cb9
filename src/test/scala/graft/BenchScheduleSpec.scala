package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-pacing is what stands between a long run and the
  * driver's kill timer (the r13 record died rc=124 with no summary);
  * these are pure-function checks that the degradation ladder sheds
  * reps monotonically and never sheds queries.
  */
class BenchScheduleSpec extends AnyFunSuite {

  test("pass 1 runs the full adaptive protocol while under 55% budget") {
    assert(BenchSchedule.pass1Reps(0.0, 2, 6) == ((2, 6, true)))
    assert(BenchSchedule.pass1Reps(0.54, 2, 6) == ((2, 6, true)))
  }

  test("pass 1 stops extending and bumping in the 55-80% band") {
    val (f, c, bump) = BenchSchedule.pass1Reps(0.60, 2, 6)
    assert(f == 2 && c == 2 && !bump)
  }

  test("pass 1 drops to a single unbumped rep past 80%") {
    assert(BenchSchedule.pass1Reps(0.81, 2, 6) == ((1, 1, false)))
    assert(BenchSchedule.pass1Reps(5.0, 2, 6) == ((1, 1, false)))
  }

  test("pass 2 cap degrades 3 -> 1 -> 0 as the budget fills") {
    assert(BenchSchedule.pass2Cap(0.1) == 3)
    assert(BenchSchedule.pass2Cap(0.79) == 3)
    assert(BenchSchedule.pass2Cap(0.80) == 1)
    assert(BenchSchedule.pass2Cap(0.94) == 1)
    assert(BenchSchedule.pass2Cap(0.95) == 0)
    assert(BenchSchedule.pass2Cap(2.0) == 0)
  }

  test("rep budget never increases as elapsed fraction grows") {
    val fracs = (0 to 150).map(_ * 0.01)
    val p1 = fracs.map { fr =>
      val (f, c, _) = BenchSchedule.pass1Reps(fr, 2, 6); (f, c)
    }
    assert(p1.sliding(2).forall { case Seq((f1, c1), (f2, c2)) =>
      f2 <= f1 && c2 <= c1 })
    val p2 = fracs.map(BenchSchedule.pass2Cap)
    assert(p2.sliding(2).forall { case Seq(a, b) => b <= a })
    // and at every point each query still gets at least one pass-1 rep
    assert(p1.forall { case (f, c) => f >= 1 && c >= 1 })
  }
}
