package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph}

/** Incremental component/cluster label maintenance
  * ([[Dedup.clustersIncremental]] / [[Graph.componentsIncremental]]):
  * the contracted merge must land EXACTLY where a from-scratch
  * converged min-label loop lands, for every merge topology a daily
  * batch can produce — component unions, never-seen nodes bridging
  * stored components, brand-new components, batches that change
  * nothing — and re-applying a batch must be a no-op (idempotence:
  * the at-least-once delivery contract of every streaming maintainer).
  */
class IncrementalLabelsSpec extends SparkSpec {

  private def rows(df: DataFrame) =
    df.orderBy("doc_id").collect().map(_.toSeq).toSeq

  private def edgesOf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def fullLabels(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val e = edgesOf(pairs)
    val nodes = e.select($"src".as("doc_id")).union(e.select($"dst")).distinct()
    Dedup.clustersOver(nodes, e, Dedup.MaintenanceMaxHops)
  }

  private def storeOf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    fullLabels(pairs).select($"doc_id", $"cluster_id")
  }

  test("every merge topology lands where the converged full recompute lands") {
    // base: components {1,2,3}, {10,11}, {20,21}, isolated-pair {30,31}
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (30L, 31L))
    // batch: merge {1,2,3}+{10,11} via a stored-node edge, bridge
    // {20,21}+{30,31} through a NEVER-SEEN node 40, and plant a brand-
    // new component {50,51} plus a deep chain hanging off it — every
    // class in one batch
    val batch = Seq((3L, 10L), (20L, 40L), (40L, 30L),
      (50L, 51L), (51L, 52L), (52L, 53L), (53L, 54L))
    val inc = Dedup.clustersIncremental(storeOf(base), edgesOf(batch))
    assert(rows(inc) === rows(fullLabels(base ++ batch)))
    // the merged families got the GLOBAL min as representative
    val labelOf = inc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelOf(11L) === 1L && labelOf(40L) === 20L && labelOf(54L) === 50L)
  }

  test("a batch inside one stored component changes nothing, and re-ingest is idempotent") {
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val noop = Seq((1L, 3L)) // contracts to a self-loop
    val store = storeOf(base)
    assert(rows(Dedup.clustersIncremental(store, edgesOf(noop)))
      === rows(fullLabels(base)))
    assert(Dedup.clustersIncrementalDelta(store, edgesOf(noop)).count() === 0L)
    // apply a real merge, then re-ingest the SAME batch against the
    // updated store: the edges contract to self-loops, delta is empty
    val batch = Seq((3L, 10L), (10L, 50L))
    val applied = Dedup.clustersIncremental(store, edgesOf(batch))
      .select("doc_id", "cluster_id")
    assert(Dedup.clustersIncrementalDelta(applied, edgesOf(batch)).count() === 0L)
    assert(rows(Dedup.clustersIncremental(applied, edgesOf(batch)))
      === rows(fullLabels(base ++ batch)))
  }

  test("a changed mapping past the pushdown cap fails loudly; at the cap it still works") {
    // base: three singleton-pair components; batch merges all three
    // into component 1 → changed mapping = {10→1, 20→1} (2 merged
    // reps; component 1's rep wins and is not "changed")
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val batch = Seq((2L, 10L), (11L, 20L))
    val store = storeOf(base)
    // AT the cap (maxReps = 2 = |changed|): the delta path works and
    // lands exactly where the full recompute's changed rows land
    val atCap = Dedup.clustersIncrementalDelta(store, edgesOf(batch), maxReps = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(atCap === Seq((10L, 1L), (11L, 1L), (20L, 1L), (21L, 1L)))
    // PAST the cap: the bulk-backfill guard throws, naming the
    // from-scratch recompute path — it must never fall back to
    // broadcasting an unbounded mapping
    val e = intercept[IllegalArgumentException] {
      Dedup.clustersIncrementalDelta(store, edgesOf(batch), maxReps = 1).count()
    }
    assert(e.getMessage.contains("bulk backfill"))
    assert(e.getMessage.contains("clustersOver"))
  }

  test("the delta is exactly the changed-or-new rows") {
    import spark.implicits._
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val batch = Seq((2L, 10L), (30L, 31L))
    val d = Dedup.clustersIncrementalDelta(storeOf(base), edgesOf(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // {10,11} merges under rep 1; {30,31} is new; {20,21} untouched
    assert(d === Seq((10L, 1L), (11L, 1L), (30L, 30L), (31L, 30L)))
  }

  test("span-graph incremental query ≡ converged full recompute (sf0.001)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.operators.TextAnalysis.sharedSpans(spark, dir)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty)
    val inc = Graph.componentsIncremental(spark, dir)
    assert(rows(inc) === rows(fullLabels(pairs)))
    // the fixture's split must actually exercise the merge machinery:
    // the batch is non-empty and merges at least one stored component
    val batchN = pairs.count { case (a, b) => (a + b) % Graph.IncrementalBatchMod == 0 }
    assert(batchN > 0, "fixture split produced an empty batch")
  }

  test("delta store probe prunes a cluster_id-clustered store to the touched files") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // 40 disjoint 10-node chain components, labels 0, 1000, …, 39000;
    // persisted range-clustered on cluster_id into 4 files (the
    // labelStoreInit physical shape) — each file covers ~10 components
    val pairs = (0 until 40).flatMap { k =>
      (0 until 9).map(i => (k * 1000L + i, k * 1000L + i + 1))
    }
    val out = java.nio.file.Files
      .createTempDirectory("graft-delta-prune").toString + "/store"
    graft.engine.Layouts.rangeWrite(
      storeOf(pairs).orderBy("doc_id"), out, "cluster_id", files = 8)
    val store = spark.read.parquet(out)
    val total = store.count()
    assert(total === 400L)
    // the batch merges components 0 and 1000 only — changed = {1000→0}
    val delta = Dedup.clustersIncrementalDelta(store, edgesOf(Seq((9L, 1000L))))
    val got = delta.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.length === 10 && got.forall(_._2 === 0L)
      && got.map(_._1).sorted === (1000L to 1009L))
    // the relabel probe carried the touched-representative IN filter
    // into the scan and row-group stats pruned it below the store size
    // TreeNode.collect does not descend into AQE query stages (their
    // plans are members, not children) — recurse through them
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      }.flatten
    val plan = delta.queryExecution.executedPlan
    // dedupe: a reused query stage surfaces the same scan through two
    // tree paths, double-counting its metric
    val prunedScans = allScans(plan)
      .groupBy(_.id).map(_._2.head).toSeq
      .filter(s => s.metadata.get("PushedFilters").exists(f =>
        f.contains("In(cluster_id") || f.contains("EqualTo(cluster_id")))
    assert(prunedScans.nonEmpty, s"no pushed cluster_id filter in:\n$plan")
    val scanned = prunedScans.map(_.metrics("numOutputRows").value).sum
    assert(scanned < total / 2,
      s"probe scan must prune the clustered store: read $scanned of $total")
  }

  test("the full-table relabel join broadcasts the changed mapping") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // the store side is corpus-sized and must NEVER shuffle for the
    // relabel: the touched-components mapping is the build side of a
    // broadcast join (the daily-batch contract the scaladoc names)
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val full = Dedup.clustersIncremental(storeOf(base), edgesOf(Seq((2L, 10L))))
    full.collect()
    val plan = (full.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("BroadcastHashJoin"),
      s"relabel join must broadcast the mapping:\n$plan")
  }

  test("the delta path never sort-merges the store (zero store shuffles)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // both store passes (seed probe, relabel probe) are hinted
    // broadcast joins with the store as the streamed side — a
    // SortMergeJoin anywhere in the delta plan means a corpus-sized
    // shuffle snuck back in
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val d = Dedup.clustersIncrementalDelta(storeOf(base),
      edgesOf(Seq((2L, 10L), (21L, 40L))))
    d.collect()
    val plan = (d.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(!plan.contains("SortMergeJoin"),
      s"delta plan must not shuffle the store:\n$plan")
  }

  test("dedup-cluster twin: minhash store maintained incrementally ≡ full clusters") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val edges = Dedup.minhashLsh(spark, dir)
      .filter($"est_jaccard" >= Dedup.ClusterThreshold)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty)
    // yesterday = every edge whose sum is odd; today's batch = the rest
    val (batch, base) = edges.partition { case (a, b) => (a + b) % 2 == 0 }
    assert(base.nonEmpty && batch.nonEmpty)
    // docs with no base edge are absent from the store (the singleton
    // rows clusters() emits for them are node-universe bookkeeping,
    // not component state) — restrict the comparison to the edge-
    // bearing universe, which is what the maintained store covers
    val inc = Dedup.clustersIncremental(storeOf(base), edgesOf(batch))
    assert(rows(inc) === rows(fullLabels(edges)))
  }
}
