package graft

import graft.operators.{DataQuality, EntityResolution, Similarity, TextAnalysis}

/** Plan-shape assertions for this session's new operators. */
class PlanAudit10Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("fk orphan audit joins every dimension by broadcast hash, never cartesian") {
    val df = DataQuality.fkOrphans(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dimension key sets must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cross products belong here:\n$plan")
    // r12: the child pre-aggregates on the FK before the parent join,
    // so the distinct orphan-key count is a plain count over unique
    // keys — a countDistinct would surface as an Expand over joined
    // fact rows (measured ~25% slower at sf0.1, worse at scale)
    assert(!plan.contains("Expand"),
      s"fk audit must not pay a countDistinct Expand:\n$plan")
    assert(df.count() === DataQuality.FkRelations.length)
  }

  test("er match scores only blocked pairs via equi-joins and a grouped top-1") {
    val df = EntityResolution.matchMentions(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"candidate generation must stay an equi-join on the blocking key:\n$plan")
    // r15: the election is the banded best-so-far fold over per-mention
    // candidate arrays — one collect_set aggregation, no pair-row
    // window election (and no second distinct exchange) at all
    assert(plan.contains("collect_set"),
      s"the per-mention election must fold over collected candidate arrays:\n$plan")
    assert(!plan.contains("Window"),
      s"the pair-row window election was retired in r15:\n$plan")
  }

  test("stream-safe er enrich is a pure projection: no exchange, no join") {
    import spark.implicits._
    val m = Seq((1L, "red widget")).toDF("mention_id", "mention")
    val plan = EntityResolution.erEnrich(m, Seq((1L, "red widget"), (2L, "blue bolt")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stateless stream projections cannot shuffle:\n$plan")
    assert(!plan.contains("Join"), s"the catalog must ride as a literal, not a join:\n$plan")
  }

  test("bpe encode folds over the distinct vocabulary, never a global window") {
    val df = TextAnalysis.bpeEncode(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cross products:\n$plan")
    // merges are driver literals baked into the fold — nothing may
    // join against a merge-table relation
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"merge table must not join:\n$plan")
    assert(df.count() > 0)
  }

  test("ivf compact is one keyed aggregate over the assignment plus broadcasts") {
    val df = Similarity.ivfCompact(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"k-row report joins must broadcast, never sort-merge:\n$plan")
    assert(df.count() === Similarity.IvfNumCentroids)
  }
}
