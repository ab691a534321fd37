package graft

/** Plan-shape regression guards (the properties PLANS.md documents):
  * losing any of these silently would be a scale regression even if
  * results stay correct.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q09 star join broadcasts all dimensions (no shuffle joins)") {
    val p = planOf("q09_revenue_by_region")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q09 fact scan prunes to the 3 needed columns") {
    val p = planOf("q09_revenue_by_region")
    val scanLine = p.linesIterator.find(l => l.contains("parquet") && l.contains("lineitem")).get
    assert(scanLine.contains("l_orderkey") && scanLine.contains("l_extendedprice"))
    assert(!scanLine.contains("l_comment") && !scanLine.contains("l_shipdate"))
  }

  test("q10 top-k prunes map-side: partial agg before the shuffle, no window sort") {
    val p = planOf("q10_topk_window")
    // bounded topK aggregator: partial + final ObjectHashAggregate around
    // the exchange — the shuffle carries <=k rows per (partition, group)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("Window("), "full window sort would shuffle the whole table")
  }

  test("q47 pushes the date filter into the parquet scan") {
    val p = planOf("q47_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q01 aggregates partially before the exchange") {
    val p = planOf("q01_daily_agg")
    // partial + final pattern: two HashAggregates around one Exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("Exchange"))
  }

  test("q24 broadcasts the one-row query vector side") {
    assert(planOf("q24_cosine_topk").contains("BroadcastExchange"))
  }

  test("q27 contains no pairwise document self-join (anchor pattern)") {
    val p = planOf("q27_minhash_lsh")
    // the only joins are band-bucket anchor + fingerprint verification —
    // a pairwise self-join would show a join condition on doc_a/doc_b
    // ranges; structurally we assert there is no cartesian/NLJ fallback
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
