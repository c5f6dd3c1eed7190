package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the contention-robust bench protocol (VERDICT r7 wrong #1 /
  * next-round #1). The loaded-box case is simulated with an injected
  * workload that is slow for the warm-up + first timed pass (the
  * contention window) and fast for the automatic re-run — exactly the
  * BENCH_r07 failure shape (q1 3.10 s on the board, 0.57 s on re-measure).
  */
class BenchSpec extends AnyFunSuite {

  test("median is the middle of the sorted 3-run pass") {
    assert(Bench.median(Seq(0.3, 0.1, 0.2)) == 0.2)
    assert(Bench.median(Seq(5.0)) == 5.0)
  }

  test("rerun triggers only past 1.5x baseline (+50ms slack)") {
    assert(Bench.needsRerun(3.10, Some(0.24)))          // BENCH_r07 q1 phantom
    assert(!Bench.needsRerun(0.30, Some(0.24)))         // noise band
    assert(!Bench.needsRerun(0.24 * 1.5 + 0.049, Some(0.24))) // inside slack
    assert(Bench.needsRerun(0.24 * 1.5 + 0.051, Some(0.24)))
    assert(!Bench.needsRerun(99.0, None))               // no baseline -> never
  }

  test("loaded box: rerun catches the outlier and the better pass is reported") {
    // 4 slow calls (warm-up + pass 1 under contention), then fast.
    var calls = 0
    val workload = () => {
      calls += 1
      Thread.sleep(if (calls <= 4) 120 else 10)
    }
    val r = Bench.timeQuery("sim", workload, baseline = Some(0.02))
    assert(r.rerun.isDefined, "outlier must trigger the second pass")
    assert(r.mainMedian > 0.1, "pass-1 median shows the contention")
    assert(r.finalMedian < 0.1, "reported value comes from the clean rerun pass")
    assert(r.minOfRuns <= r.finalMedian)
    assert(calls == 7) // warm-up + 3 + 3 rerun (rerun has no extra warm-up)
  }

  test("clean run: no baseline or in-band median means no rerun") {
    val fast = () => Thread.sleep(5)
    val r1 = Bench.timeQuery("nobase", fast, baseline = None)
    assert(r1.rerun.isEmpty && r1.finalMedian == r1.mainMedian)
    val r2 = Bench.timeQuery("inband", fast, baseline = Some(0.005))
    assert(r2.rerun.isEmpty)
  }

  test("failed query reports -1 and never reruns") {
    val boom = () => throw new RuntimeException("boom")
    val r = Bench.timeQuery("fail", boom, baseline = Some(0.1))
    assert(r.failed && r.finalMedian == -1.0 && r.minOfRuns == -1.0 && r.rerun.isEmpty)
  }

  test("baseline TSV parses and full/compact JSON are valid shapes") {
    val m = Bench.parseBaseline(Iterator("# comment", "", "q1_agg\t0.24", "k2\t1.84"))
    assert(m == Map("q1_agg" -> 0.24, "k2" -> 1.84))
    val rs = Seq(
      Bench.QueryTiming("a", Seq(0.1, 0.2, 0.3), None, Some(0.15)),
      Bench.QueryTiming("b", Seq(1.0, 1.1, 1.2), Some(Seq(0.2, 0.3, 0.4)), Some(0.25)),
      Bench.QueryTiming("c", Nil, None, None))
    val compact = Bench.compactJson(rs, "/root/testdata/sf0.1")
    // b's reported value is the rerun median; c failed -> -1 excluded from total
    assert(compact.contains("\"b\":0.3"))
    assert(compact.contains("\"value\":0.5"))
    assert(compact.endsWith("\"sf\":\"sf0.1\"}"))
    assert(Bench.shortNum(1.00) == "1" && Bench.shortNum(12.407) == "12.41" &&
      Bench.shortNum(-1.0) == "-1" && Bench.shortNum(0.29) == "0.29")
    val full = Bench.fullJson(rs, "/x")
    assert(full.contains("\"rerun\":[0.200,0.300,0.400]"))
    assert(full.contains("\"baseline\":null"))
    // the checked-in resource must parse if present
    Bench.loadBaseline() // throws on malformed lines
  }
}
