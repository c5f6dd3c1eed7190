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

  test("gate is max(1.5x baseline, baseline + 250ms): absolute arm " +
    "absorbs sub-second solo-vs-in-sweep deltas (VERDICT r11 #3)") {
    assert(Bench.needsRerun(3.10, Some(0.24)))          // BENCH_r07 q1 phantom
    assert(!Bench.needsRerun(0.30, Some(0.24)))         // noise band
    // the q15 incident: 0.16 s in-sweep baseline, 0.28 s honest solo run —
    // 1.75x but only +0.12 s; the absolute arm keeps it clean
    assert(!Bench.needsRerun(0.28, Some(0.16)))
    // while the driver's genuinely contended 0.90 s still flags
    assert(Bench.needsRerun(0.90, Some(0.16)))
    // boundary: gate sits at baseline + 0.25 when that exceeds 1.5x
    assert(!Bench.needsRerun(0.16 + 0.249, Some(0.16)))
    assert(Bench.needsRerun(0.16 + 0.251, Some(0.16)))
    // past ~0.5 s the ratio arm dominates, unchanged from the old gate
    assert(!Bench.needsRerun(5.9, Some(4.0)))
    assert(Bench.needsRerun(6.1, Some(4.0)))
    assert(!Bench.needsRerun(99.0, None))               // no baseline -> never
  }

  test("sweep order: seeded shuffle is a reproducible permutation and " +
    "decorrelates adjacency across seeds (VERDICT r11 #3)") {
    val entries = (1 to 40).map(i => f"q$i%02d" -> i)
    val a = Bench.sweepOrder(entries, seed = 7L)
    val b = Bench.sweepOrder(entries.reverse, seed = 7L) // input order irrelevant
    assert(a == b, "same seed must give the same order regardless of input order")
    assert(a.sortBy(_._1) == entries.sortBy(_._1), "must be a permutation")
    val c = Bench.sweepOrder(entries, seed = 8L)
    assert(a != c, "different seeds must not pin the same order")
    // the fixed-alphabetical pathology: q14/q15 adjacent every sweep
    assert(a != entries.sortBy(_._1) || c != entries.sortBy(_._1))
  }

  test("loaded box: rerun catches the outlier and the better pass is reported") {
    // 4 slow calls (warm-up + pass 1 under contention), then fast. 400 ms
    // vs a 20 ms baseline clears BOTH gate arms (ratio and +250 ms).
    var calls = 0
    val workload = () => {
      calls += 1
      Thread.sleep(if (calls <= 4) 400 else 10)
    }
    val r = Bench.timeQuery("sim", workload, baseline = Some(0.02))
    assert(r.rerun.isDefined, "outlier must trigger the second pass")
    assert(r.mainMedian > 0.3, "pass-1 median shows the contention")
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

  test("both passes over the gate => suspect flag; a rescued rerun is clean") {
    // Simulated fully-loaded window: slow through warm-up, pass 1 AND the
    // rerun — the number never clears contention (VERDICT r8 wrong #2).
    val alwaysSlow = () => Thread.sleep(400)
    val s = Bench.timeQuery("loaded", alwaysSlow, baseline = Some(0.02))
    assert(s.rerun.isDefined && s.suspect,
      "a rerun that is still over the gate must be flagged suspect")
    // Contention only during pass 1: the rerun rescues it — NOT suspect.
    var calls = 0
    val rescued = () => { calls += 1; Thread.sleep(if (calls <= 4) 400 else 10) }
    val r = Bench.timeQuery("rescued", rescued, baseline = Some(0.02))
    assert(r.rerun.isDefined && !r.suspect)
    // No rerun at all: never suspect.
    assert(!Bench.timeQuery("fast", () => Thread.sleep(5),
      baseline = Some(0.05)).suspect)
    assert(Bench.suspects(Seq(s, r)) == Seq("loaded"))
    // the suspect list rides both JSON artifacts
    assert(Bench.fullJson(Seq(s, r), "/x").contains(""""suspect":["loaded"]"""))
    assert(Bench.summaryJson(Seq(s, r), "/x").contains(""""suspect":["loaded"]"""))
  }

  test("summary line: byte-capped, parse-shaped, top-cost entries first") {
    // 200 long-named entries would make the full compact line ~6 KB; the
    // summary line must stay under its cap no matter the entry count —
    // that cap (< the driver's ~2 KB tail window) is the whole fix for
    // eight rounds of parsed:null head-truncation.
    val many = (1 to 200).map { i =>
      Bench.QueryTiming(f"q${i}%03d_some_operator_name", Seq(i * 0.01, i * 0.011, i * 0.012),
        None, None)
    }
    val line = Bench.summaryJson(many, "/root/testdata/sf0.1", maxBytes = 1200)
    assert(line.length <= 1200, s"summary line ${line.length} B over cap")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(""""audit":"target/bench.json","sf":"sf0.1"}"""))
    assert(line.contains(""""n":200"""))
    // the most expensive query always makes the cut; the cheapest is culled
    assert(line.contains("\"q200_some_operator_name\":"))
    assert(!line.contains("\"q001_some_operator_name\":"))
    // balanced braces — the line is a complete JSON object, not a prefix
    assert(line.count(_ == '{') == line.count(_ == '}'))
    // a tiny result set fits whole
    val small = many.take(3)
    val all3 = Bench.summaryJson(small, "/x")
    assert(Seq("q001", "q002", "q003").forall(n => all3.contains(n)))
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

  test("contention telemetry (VERDICT r12 #8): every timed run carries a " +
    "loadavg sample in run order, and the audit JSON serializes it") {
    val t = Bench.timeQuery("q", () => (), Some(10.0))
    assert(t.mainRuns.length === 3, "3 timed runs -> 3 (sec, load) pairs")
    assert(t.mainRuns.forall { case (sec, la) => sec >= 0.0 && la >= -1.0 })
    val slow = Bench.QueryTiming("k24", Seq(6.0, 8.0, 26.35), None, Some(6.0),
      mainRuns = Seq((8.0, 2.1), (6.0, 1.9), (26.35, 31.5)))
    val json = Bench.fullJson(Seq(slow), "sf")
    assert(json.contains("\"runs\":[{\"sec\":8.000,\"load\":2.10}"),
      s"run-ordered (sec, load) pairs must serialize: $json")
    assert(json.contains("\"load\":31.50"),
      "the outlier run's load must be attributable in the audit")
    assert(json.contains("\"rerun_runs\":null"))
  }

  test("r14 loop-rerun: passes repeat until one clears the gate; a " +
    "third-pass rescue is NOT suspect and calls stay bounded") {
    var calls = 0
    // warm-up + pass1 (slow) + pass2 (slow) + pass3 (fast): 10 calls
    val load = () => 0.5 // calm box: waits never trigger
    val w = () => { calls += 1; if (calls <= 7) Thread.sleep(300) else Thread.sleep(5) }
    val r = Bench.timeQuery("late_rescue", w, Some(0.01),
      maxRerunPasses = 3, calmWaitMs = 5000, load = load)
    assert(calls == 10, s"warm-up + 3 passes x 3 runs, got $calls")
    assert(r.rerunMedians.length == 2 || r.rerunMedians.length == 3)
    assert(!r.suspect, "the clearing pass rescues the entry")
    assert(r.finalMedian < 0.05)
  }

  test("r14 calm-wait: reruns wait while load exceeds the bound, within " +
    "budget, and waiting stops the moment the box calms") {
    var slept = 0L
    var loadCalls = 0
    val load = () => { loadCalls += 1; if (slept >= 2000) 0.3 else 99.0 }
    val r = Bench.timeQuery("stormy", () => Thread.sleep(300), Some(0.001),
      maxRerunPasses = 1, calmWaitMs = 10000,
      load = load, sleep = ms => { slept += ms })
    assert(slept == 2000, s"must stop waiting once calm, slept $slept ms")
    assert(r.rerunMedians.length == 1)
  }

  test("r14 load attribution: every pass breached under sustained load " +
    "-> final is min-of-all-timings, attribution rides both JSON lines") {
    var n = 0
    val durations = Seq(0.0, 400, 380, 360, 300, 350, 370) // warm-up first
    val w = () => { Thread.sleep(durations(math.min(n, 6)).toLong); n += 1 }
    val loaded = Bench.timeQuery("storm", w, Some(0.02),
      maxRerunPasses = 1, calmWaitMs = 0, load = () => 50.0)
    assert(loaded.allRunsLoaded && loaded.loadAttributed)
    assert(loaded.finalMedian == loaded.minOfRuns,
      "attributed final must be the least-contended real run")
    assert(loaded.maxLoad == 50.0)
    // still over the gate even as a min -> suspect WITH attribution
    assert(loaded.suspect)
    val summary = Bench.summaryJson(Seq(loaded), "/x")
    assert(summary.contains("\"suspect\":[\"storm\"]"))
    assert(summary.contains(
      "\"suspect_load\":{\"storm\":{\"max_load\":50.00,\"all_loaded\":true}}"),
      s"machine-readable attribution must ride the summary line: $summary")
    assert(Bench.fullJson(Seq(loaded), "/x").contains("\"load_attributed\":true"))
    // the same breach on a CALM box: no attribution, plain suspect
    var m = 0
    val w2 = () => { Thread.sleep(durations(math.min(m, 6)).toLong); m += 1 }
    val calm = Bench.timeQuery("calm_slow", w2, Some(0.02),
      maxRerunPasses = 1, calmWaitMs = 0, load = () => 0.4)
    assert(!calm.loadAttributed && calm.suspect)
    assert(Bench.summaryJson(Seq(calm), "/x").contains("\"all_loaded\":false"))
  }

  test("r18 rerun budget (VERDICT r17 #1): once the sweep-wide budget is " +
    "spent, a gate breach skips the rerun, keeps the contended number, " +
    "and is marked rerun_skipped + suspect") {
    val spent = new java.util.concurrent.atomic.AtomicLong(0L)
    var calls = 0
    val slow = () => { calls += 1; Thread.sleep(300) }
    val r = Bench.timeQuery("budgeted", slow, Some(0.02),
      maxRerunPasses = 3, calmWaitMs = 0, load = () => 0.4,
      rerunBudgetMs = spent)
    assert(calls == 4, "warm-up + 3 timed runs only — no rerun pass ran")
    assert(r.rerunSkipped && r.rerun.isEmpty)
    assert(r.suspect, "a budget-skipped breach must stay visibly unconfirmed")
    assert(r.finalMedian > 0.25, "the contended pass-1 number is reported")
    assert(Bench.fullJson(Seq(r), "/x").contains("\"rerun_skipped\":true"))
    assert(Bench.summaryJson(Seq(r), "/x").contains("\"suspect\":[\"budgeted\"]"))
  }

  test("r18 rerun budget: passes that DO run charge real wall-clock, and " +
    "the budget cuts the loop mid-entry once spent") {
    val budget = new java.util.concurrent.atomic.AtomicLong(100L) // ~one pass
    var calls = 0
    // 300 ms clears BOTH gate arms vs the 1 ms baseline (the +250 ms
    // absolute arm would absorb anything shorter)
    val slow = () => { calls += 1; Thread.sleep(300) }
    val r = Bench.timeQuery("charges", slow, Some(0.001),
      maxRerunPasses = 3, calmWaitMs = 0, load = () => 0.4,
      rerunBudgetMs = budget)
    assert(r.rerunMedians.length == 1,
      s"first rerun pass runs (budget was positive), got ${r.rerunMedians.length}")
    assert(budget.get() < 100L, "the pass must charge the shared budget")
    assert(r.rerunSkipped, "the second pass is cut by the spent budget")
    assert(r.suspect)
    // a clean entry under the same spent budget never touches the machinery
    val ok = Bench.timeQuery("fast", () => Thread.sleep(5), Some(0.05),
      rerunBudgetMs = budget)
    assert(!ok.rerunSkipped && !ok.suspect)
  }

  test("r18 last-line-wins (VERDICT r17 #1): a mid-sweep summary line is " +
    "complete JSON, self-describing as partial via n < of") {
    val roster = (1 to 10).map(i =>
      Bench.QueryTiming(f"q$i%02d", Seq(0.1, 0.11, 0.12), None, None))
    // simulate the per-entry emission: after entry i the line carries the
    // completed prefix; a SIGKILL anywhere leaves the last one parseable
    (1 to 10).foreach { i =>
      val line = Bench.summaryJson(roster.take(i), "/x", ofTotal = Some(10))
      assert(line.count(_ == '{') == line.count(_ == '}'),
        s"entry $i: line must be a complete JSON object")
      assert(line.contains(s""""n":$i,"of":10"""),
        s"entry $i: completed-count vs roster-size must ride the line")
      assert(line.endsWith(""""audit":"target/bench.json","sf":"x"}"""))
    }
    // the no-ofTotal shape (direct callers, old tests) is unchanged
    assert(Bench.summaryJson(roster, "/x")
      .contains(""""n":10,"window_ratio""""))
  }

  test("r17 watch (VERDICT r16 #10): over 2x baseline but under the rerun " +
    "floor -> named machine-readably in both JSON lines, never a suspect") {
    // q47's exact shape: baseline 0.19, median 0.424 — over 2x (0.38),
    // under max(1.5x, +250ms)=0.44, so no rerun ever fires
    val t = Bench.QueryTiming("q47ish", Seq(0.41, 0.424, 0.43), None,
      Some(0.19), mainRuns = Seq((0.424, 0.5), (0.41, 0.5), (0.43, 0.5)))
    assert(t.watch && !t.suspect)
    assert(Bench.watchList(Seq(t)) == Seq("q47ish"))
    assert(Bench.summaryJson(Seq(t), "/x").contains("\"watch\":[\"q47ish\"]"))
    assert(Bench.fullJson(Seq(t), "/x").contains("\"watch\":[\"q47ish\"]"))
    // in-band entry: not watched
    val ok = Bench.QueryTiming("fine", Seq(0.20, 0.21, 0.22), None, Some(0.19))
    assert(!ok.watch)
    assert(Bench.summaryJson(Seq(ok), "/x").contains("\"watch\":[]"))
    // a genuine suspect (rerun fired, never cleared) is NOT double-listed
    val durations = Seq(0.0, 400, 380, 360, 300, 350, 370)
    var n = 0
    val w = () => { Thread.sleep(durations(math.min(n, 6)).toLong); n += 1 }
    val sus = Bench.timeQuery("slow", w, Some(0.02),
      maxRerunPasses = 1, calmWaitMs = 0, load = () => 0.4)
    assert(sus.suspect && !sus.watch)
  }

  test("r19 per-entry rerun cap (VERDICT r18 #3): a hog entry charges at " +
    "most one capped pass, so a LATER breach still gets its rerun from " +
    "the shared budget") {
    // budget sized so the OLD behavior (3 passes for the hog, ~2.7 s
    // charged) would starve the later entry, while one capped pass
    // (~0.9 s) leaves budget for it
    val budget = new java.util.concurrent.atomic.AtomicLong(1500L)
    val hogRun = () => Thread.sleep(300)
    val hog = Bench.timeQuery("hog", hogRun, Some(0.001),
      maxRerunPasses = 1, calmWaitMs = 0, load = () => 0.4,
      rerunBudgetMs = budget, perEntryBudgetMs = Bench.PerEntryRerunMs)
    assert(hog.rerunMedians.length == 1,
      "the sweep visit adds exactly ONE rerun pass (3 timings)")
    assert(budget.get() > 0L,
      s"one capped pass must not drain the sweep budget, left ${budget.get()}")
    val later = Bench.timeQuery("later", () => Thread.sleep(300), Some(0.001),
      maxRerunPasses = 1, calmWaitMs = 0, load = () => 0.4,
      rerunBudgetMs = budget, perEntryBudgetMs = Bench.PerEntryRerunMs)
    assert(!later.rerunSkipped && later.rerunMedians.nonEmpty,
      "the later breach must still get its rerun")
  }

  test("r19 per-entry wall budget cuts a multi-pass loop even when the " +
    "sweep budget and pass count would allow more") {
    var calls = 0
    val slow = () => { calls += 1; Thread.sleep(300) }
    val r = Bench.timeQuery("entrycap", slow, Some(0.001),
      maxRerunPasses = 3, calmWaitMs = 0, load = () => 0.4,
      perEntryBudgetMs = 500L) // < one ~900 ms pass
    assert(r.rerunMedians.length == 1,
      s"pass 2 must be blocked by the entry budget, got ${r.rerunMedians.length}")
    assert(r.suspect)
  }

  test("r19 window_ratio: the median sweep ratio rides both JSON lines " +
    "so a uniformly-elevated box window is machine-attributable") {
    def qt(name: String, sec: Double, base: Double) =
      Bench.QueryTiming(name, Seq(sec, sec, sec), None, Some(base))
    // the slow-window shape: everything ~1.4x -> window_ratio says so
    val window = (1 to 9).map(i => qt(s"q$i", 0.42, 0.30))
    assert(math.abs(Bench.windowRatio(window) - 1.4) < 0.01)
    assert(Bench.summaryJson(window, "/x").contains("\"window_ratio\":1.4"))
    assert(Bench.fullJson(window, "/x").contains("\"window_ratio\":1.400"))
    // the real-regression shape: one outlier leaves the median ~1
    val spike = (1 to 8).map(i => qt(s"q$i", 0.30, 0.30)) :+ qt("bad", 3.0, 0.3)
    assert(math.abs(Bench.windowRatio(spike) - 1.0) < 0.01)
    // no baselines -> -1, and the line still parses
    val none = Seq(Bench.QueryTiming("x", Seq(0.1, 0.1, 0.1), None, None))
    assert(Bench.windowRatio(none) === -1.0)
    val line = Bench.summaryJson(none, "/x")
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("r19 secondChance: leftover budget goes to the worst-ratio " +
    "pending entries first, merges the pass into the entry's evidence, " +
    "and clears rerun_skipped") {
    import scala.collection.mutable.ArrayBuffer
    def breached(name: String, sec: Double, base: Double,
        skipped: Boolean) =
      Bench.QueryTiming(name, Seq(sec, sec, sec), None, Some(base),
        mainRuns = Seq((sec, 0.4), (sec, 0.4), (sec, 0.4)),
        rerunSkipped = skipped)
    val acc = ArrayBuffer(
      breached("mild", 0.9, 0.3, skipped = true),   // 3.0x
      Bench.QueryTiming("fine", Seq(0.1, 0.1, 0.1), None, Some(0.09)),
      breached("awful", 3.0, 0.3, skipped = true))  // 10.0x
    val order = ArrayBuffer.empty[String]
    val runs = Map[String, () => Unit](
      "mild" -> (() => { order += "mild"; Thread.sleep(5) }),
      "awful" -> (() => { order += "awful"; Thread.sleep(5) }))
    var updates = 0
    val budget = new java.util.concurrent.atomic.AtomicLong(60000L)
    Bench.secondChance(acc, runs, calmWaitMs = 0,
      rerunBudgetMs = budget, load = () => 0.4,
      onUpdate = () => updates += 1)
    assert(order.take(3) == Seq("awful", "awful", "awful"),
      s"worst ratio first, got $order") // 3 timings of the first visit
    val awful = acc.find(_.name == "awful").get
    val mild = acc.find(_.name == "mild").get
    assert(!awful.rerunSkipped && !mild.rerunSkipped)
    assert(awful.rerun.isDefined && awful.finalMedian < 0.1,
      "the clean second-chance pass becomes the reported number")
    assert(mild.finalMedian < 0.1)
    assert(updates >= 2, "every visit re-emits the artifacts")
    // spent budget -> no visits at all
    val untouched = ArrayBuffer(breached("x", 3.0, 0.3, skipped = true))
    Bench.secondChance(untouched, Map("x" -> (() => fail("must not run"))),
      calmWaitMs = 0,
      rerunBudgetMs = new java.util.concurrent.atomic.AtomicLong(0L))
    assert(untouched.head.rerunSkipped)
  }
}
