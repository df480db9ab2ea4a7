package graft

/** SHUFFLE-BUDGET regression pins: each headline query's physical plan
  * may not grow new exchanges unnoticed — the quantitative counterpart
  * of the qualitative PlanAudit specs (a plan can keep "BroadcastHashJoin
  * present" true while silently adding a shuffle somewhere else). The
  * budgets are the CURRENT measured shuffle counts of the INITIAL
  * static plan in the test session (AQE at Spark's default — enabled —
  * so the counts are pre-reoptimization; 4 shuffle partitions); a
  * future change that exceeds one fails here first with the full plan
  * attached. Lower is always fine.
  */
class ExchangeBudgetSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** SHUFFLE exchanges only — broadcasts are cheap by design and
    * counting them would punish the exact pattern (broadcast the
    * small side) the budgets exist to protect.
    */
  private def exchanges(name: String): (Int, String) = {
    val plan = SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString
    val all = "Exchange".r.findAllIn(plan).length
    val bcast = "BroadcastExchange".r.findAllIn(plan).length
    (all - bcast, plan)
  }

  // (query, budget) — measured by ExchangeBudgetSpec.main-style sweep;
  // see the scaladoc for the regression contract
  private val budgets: Seq[(String, Int)] = Seq(
    "q1_hourly_latest" -> 1,
    "q2_leaderboard" -> 7,
    "q4a_nation_rollup" -> 2,
    "q4b_leading_status" -> 3,
    "q5a_priority_share" -> 3,
    "q6_part_projection" -> 1,
    "q7_nation_pivot" -> 5,
    "q8_supplier_lookup" -> 0,
    "q_pricing_summary" -> 2,
    "dedup_exact" -> 2,
    "dedup_minhash_lsh" -> 4,
    "dedup_ngram_jaccard" -> 3,
    "ann_cosine_topk" -> 2,
    "text_quality" -> 1,
    "corpus_sample" -> 1,
    "er_match" -> 7,
    // 7 relations × (child FK pre-aggregate + parent distinct + 1-row
    // agg) in the initial static plan; the pre-aggregate keeps the
    // join dimension-sized and the plan Expand-free (PlanAudit10Spec)
    "dq_fk_orphans" -> 21,
    "text_bpe_encode" -> 3,
    "mm_whash" -> 2,
    "mm_frame_energy" -> 1)

  budgets.foreach { case (name, budget) =>
    test(s"$name stays within its $budget-exchange budget") {
      val (n, plan) = exchanges(name)
      assert(n <= budget,
        s"$name grew to $n exchanges (budget $budget):\n$plan")
    }
  }
}
