package graft

import graft.operators.{Graph, Multimodal, Stats, WindowedEvents}

/** Round-9 plan-shape assertions for the new operators. */
class PlanAudit9Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("tvDrift fans the min/max scalar out by broadcast and never sort-merges") {
    val df = Stats.tvDrift(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the (lo, hi) scalar enters as a broadcast nested-loop (1-row
    // cross), the per-type totals as a broadcast hash join — the only
    // data-scaled exchange is the (type, bucket) aggregate
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"broadcast fan-out missing:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no sort-merge join belongs here:\n$plan")
    assert(df.count() > 0)
  }

  test("driftHourly broadcasts the baseline and the per-type totals") {
    val df = WindowedEvents.driftHourly(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"baseline must broadcast:\n$plan")
    assert(df.count() > 0)
  }

  test("degree-oriented triangles plan hash joins, never a cartesian product") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val plan = Graph.trianglesOver(pairs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"wedge enumeration must stay an equi-join:\n$plan")
  }

  test("weighted pagerank carries weights on the edge relation without extra shuffles") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 3L), (2L, 3L, 1L)).toDF("doc_a", "doc_b", "w")
    // shape parity with the unweighted core: same number of exchanges
    // in one mass-passing round (the weight is a carried column, not a
    // join)
    val w = Graph.pagerankWeightedOver(pairs).queryExecution.executedPlan.toString
    val u = Graph.pagerankOver(pairs.select("doc_a", "doc_b"))
      .queryExecution.executedPlan.toString
    def exchanges(p: String) = p.split("Exchange").length - 1
    assert(exchanges(w) <= exchanges(u) + 1,
      s"weighted form grew the shuffle count: ${exchanges(w)} vs ${exchanges(u)}")
  }

  test("ivfpq scan joins the LUT by broadcast and rank-filters via WindowGroupLimit") {
    val df = graft.operators.Similarity.ivfPqTopK(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // probes and the ADC LUT are query-sized — they must enter the
    // candidate scan as broadcasts, never shuffle the list side
    assert(plan.contains("BroadcastHashJoin"), s"LUT/probe broadcast missing:\n$plan")
    // both the ADC shortlist and the final top-k are rank filters over
    // a per-query window — the map-side k-heap form
    assert(plan.contains("WindowGroupLimit"), s"rank filters must push:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"nothing here may go quadratic:\n$plan")
  }

  test("event transitions: one user window exchange, totals re-enter by broadcast") {
    val df = WindowedEvents.eventTransitions(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source totals must broadcast back, not sort-merge:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no data-sized join belongs here:\n$plan")
    assert(df.count() > 0)
  }

  test("audience overlap: the self-join keys on user_id, sizes enter by broadcast") {
    val df = WindowedEvents.audienceOverlap(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"pair expansion must stay an equi-join on user_id:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"audience sizes must broadcast:\n$plan")
    assert(df.count() > 0)
  }

  test("frame sampler query is generate + project over the scan (no mid-plan aggregate)") {
    val df = Multimodal.frameSampleQuery(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), "frame explode missing")
    assert(!plan.contains("HashAggregate"),
      s"a pure sampler must not aggregate:\n$plan")
    assert(df.count() > 0)
  }

  test("common neighbors: equi-joined wedges, top-k via TakeOrdered, no cartesian") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val df = Graph.commonNeighborsOver(pairs)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"wedge join must key on the center:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a k-heap, not a global sort:\n$plan")
    assert(df.count() > 0)
  }

  test("zone map is a single keyed aggregate over the map-side zone id") {
    val df = Stats.zoneMap(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // exactly one aggregate pair (partial+final) — one grouping key
    assert(plan.contains("HashAggregate"), s"keyed aggregate missing:\n$plan")
    assert(!plan.contains("Join"), s"a zone map needs no join:\n$plan")
    assert(df.count() > 0)
  }
}
