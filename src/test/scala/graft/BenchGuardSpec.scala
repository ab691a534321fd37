package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench noise guard's pure pieces — the r11 lesson was a PROCESS
  * bug (a contention-corrupted sweep committed as the round's number),
  * so the guard's parsing and drift arithmetic get pinned here where
  * they can't silently rot.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("probe normalization: history scales to this host's speed; missing probes pass through") {
    val hist = Seq((0.1, Map("q1" -> 1.0, "q2" -> 3.0)), (0.0, Map("q3" -> 2.0)))
    // this run's host is 2x SLOWER (probe 0.2 vs the entry's 0.1): the
    // entry's timings double, so like compares with like
    val n = Bench.normalizeToProbe(hist, 0.2)
    assert(n(0) === Map("q1" -> 2.0, "q2" -> 6.0))
    assert(n(1) === Map("q3" -> 2.0), "entries without a probe stay raw")
    assert(Bench.parseHistoryProbe("""{"probe":0.1724,"value":9}""") === 0.1724)
    assert(Bench.parseHistoryProbe("""{"value":9}""") === 0.0)
    // the committed normalized total divides host speed out: value x
    // probeRef / probe is invariant when time and probe scale together
    val (t1, p1) = (100.0, Bench.probeRef * 1.0)
    val (t2, p2) = (120.0, Bench.probeRef * 1.2) // 20% slower host, same work
    assert(math.abs(t1 * Bench.probeRef / p1 - t2 * Bench.probeRef / p2) < 1e-9)
  }

  test("probe basis: min of pre/post probes on both sides resolves the r15 false drift flag") {
    // the basis parser: min of the line's recorded probes; pre-only
    // lines fall back; probe_ref must not match the "probe": regex
    assert(Bench.parseHistoryProbeBasis(
      """{"probe":0.2332,"probe_ref":0.20,"probe_post":0.0800,"value":9}""") === 0.08)
    assert(Bench.parseHistoryProbeBasis("""{"probe":0.1724,"value":9}""") === 0.1724)
    assert(Bench.parseHistoryProbeBasis("""{"value":9}""") === 0.0)
    // the r15 probe-disagreement shape end-to-end: the same host reads
    // intrinsic ~0.08 in idle instants and 0.16-0.23 under transient
    // contention. History recorded pre 0.2332 (contended) / post 0.08;
    // this run read pre 0.1657 / post 0.0812; the sweeps themselves ran
    // at the SAME speed (raw totals equal — the flat round the judge
    // adjudicated from per-query data).
    val qs = (1 to 25).map(i => s"q$i" -> 1.0).toMap
    // OLD basis (single pre-probe both sides): history scales DOWN by
    // 0.1657/0.2332 and the equal raw sweep reads as a >1.2 regression
    val flagged = Bench.historyDriftRatio(qs,
      Bench.normalizeToProbe(Seq((0.2332, qs)), 0.1657))
    assert(flagged.exists(_ > 1.20),
      "the single-pre-probe basis manufactures the drift flag")
    // HARDENED basis: min(pre, post) each side — 0.08 vs 0.0812 —
    // compares least-contended to least-contended, factor ~1, resolved
    val histBasis = Bench.parseHistoryProbeBasis(
      """{"probe":0.2332,"probe_post":0.0800,"value":9}""")
    val resolved = Bench.historyDriftRatio(qs,
      Bench.normalizeToProbe(Seq((histBasis, qs)), math.min(0.1657, 0.0812)))
    assert(resolved.exists(r => r > 0.9 && r <= 1.20),
      s"the min basis must resolve the flat round: $resolved")
  }

  test("parseHistoryQueries reads timings, skips plan hashes and top-level fields") {
    val line = """{"ts":1,"metric":"total","value":94.48,"unit":"sec",""" +
      """"probe":0.186,"queries":{"q01_agg":0.1234,"q181_x":4.89,"q59_props_map":-1},""" +
      """"plans":{"q01_agg":"ab12cd34","q181_x":"ef56ab78"},"sf":"/x"}"""
    val m = Bench.parseHistoryQueries(line)
    assert(m === Map("q01_agg" -> 0.1234, "q181_x" -> 4.89,
      "q59_props_map" -> -1.0))
  }

  test("historyDriftRatio: median common-total ratio; mid-sweep contention trips >1.2") {
    val names = (1 to 40).map(i => f"q$i%02d_x")
    def entry(scale: Double) = names.map(_ -> 0.5 * scale).toMap
    val hist = Seq(entry(1.0), entry(0.98), entry(1.02))
    // a clean sweep sits at ~1.0
    val clean = Bench.historyDriftRatio(entry(1.01), hist)
    assert(clean.exists(r => r > 0.95 && r < 1.10))
    // the r11 shape: broad 3x slowdowns read straight through the total
    val contended = Bench.historyDriftRatio(entry(3.0), hist)
    assert(contended.exists(_ > 1.2))
    // errored queries (-1) are excluded from both sides
    val withErr = entry(1.0) + ("q01_x" -> -1.0)
    assert(Bench.historyDriftRatio(withErr, hist).exists(r => r > 0.9 && r < 1.1))
    // too few shared queries -> no verdict (never judge on a sliver)
    val tiny = names.take(5).map(_ -> 0.5).toMap
    assert(Bench.historyDriftRatio(tiny, hist).isEmpty)
    assert(Bench.historyDriftRatio(entry(1.0), Seq.empty).isEmpty)
  }

  test("parseHistoryPlans reads the plans object, never timings or top-level fields") {
    val line = """{"ts":1,"metric":"total","value":9.5,"probe":0.2,""" +
      """"queries":{"q01_x":0.5123,"q02_y":1.0},""" +
      """"plans":{"q01_x":"ab12cd34","q02_y":"00ff00ff"},"sf":"/d"}"""
    val plans = Bench.parseHistoryPlans(line)
    assert(plans === Map("q01_x" -> "ab12cd34", "q02_y" -> "00ff00ff"))
    // a line with no plans object (pre-r7 history) parses to empty
    assert(Bench.parseHistoryPlans("""{"queries":{"q01_x":0.5}}""") === Map.empty)
  }

  test("boundedHistoryMin: merges inside the deadband, never past it") {
    // inside the 1.2x contention deadband: the least-contended same-plan
    // measurement wins
    assert(Bench.boundedHistoryMin(1.1, Seq(1.0)) === 1.0)
    assert(Bench.boundedHistoryMin(1.19, Seq(1.0, 1.5)) === 1.0)
    // AT the boundary still merges (<=)
    assert(Bench.boundedHistoryMin(1.2, Seq(1.0)) === 1.0)
    // a genuine same-plan regression beyond the deadband commits its
    // own number — a slower implementation is not maskable for 10 rounds
    assert(Bench.boundedHistoryMin(1.21, Seq(1.0)) === 1.21)
    assert(Bench.boundedHistoryMin(3.0, Seq(1.0, 1.1)) === 3.0)
    // faster than all history: keep this run's number
    assert(Bench.boundedHistoryMin(0.9, Seq(1.0, 1.2)) === 0.9)
    // errored / empty inputs pass through
    assert(Bench.boundedHistoryMin(-1.0, Seq(1.0)) === -1.0)
    assert(Bench.boundedHistoryMin(1.5, Seq.empty) === 1.5)
  }
}
