package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.{Dedup, EntityResolution}

/** Plan-shape assertions for this session's loop-relation work: the
  * min-label convergence hop and the er_cluster posting relation.
  * These pin the r11 measured findings against the REAL code paths —
  * [[Dedup.loopRelations]]/[[Dedup.hopNext]] are the exact builders
  * [[Dedup.clustersOver]]'s loop calls. The load-bearing finding the
  * first test guards: under AQE a `localCheckpoint` forgets its
  * partitioning (`AdaptiveSparkPlanExec` reports
  * `UnknownPartitioning`), so only PERSISTED loop relations keep the
  * hop at one shuffle — reverting persist to checkpoint fails here
  * with the 4-exchange non-broadcast hop plan attached.
  */
class PlanAudit11Spec extends SparkSpec {

  /** Shuffle exchanges in THIS query's plan only — a tree walk, not a
    * string count: the string form of a plan over persisted relations
    * prints each InMemoryRelation's cached plan (initial AND final),
    * whose exchanges are paid once at materialization, not per scan.
    */
  private def shuffles(df: DataFrame): (Int, String) = {
    def count(p: SparkPlan): Int =
      (p match { case _: ShuffleExchangeExec => 1; case _ => 0 }) +
        p.children.map(count).sum
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => (count(a.initialPlan), a.initialPlan.toString)
      case p => (count(p), p.toString)
    }
  }

  private def loopFixture() = {
    import spark.implicits._
    val nodes = (1L to 200L).toDF("doc_id")
    val edges = (1L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    Dedup.loopRelations(nodes, edges)
  }

  test("min-label hop shuffles exactly once: the aggregate, never the edges") {
    val (sym, labels) = loopFixture()
    try {
      val (n, plan) = shuffles(Dedup.hopNext(labels, sym))
      assert(n === 1,
        s"a hop over pre-partitioned persisted relations must shuffle only " +
          s"for the min-label aggregate, saw $n exchanges:\n$plan")
    } finally { sym.unpersist(); labels.unpersist() }
  }

  test("one-shuffle hop survives broadcast being unavailable (the 100 TB regime)") {
    val (sym, labels) = loopFixture()
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (n, plan) = shuffles(Dedup.hopNext(labels, sym))
      assert(n === 1,
        s"with no broadcast fallback the persisted partitioning must carry " +
          s"both sort-merge joins, saw $n exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      sym.unpersist(); labels.unpersist()
    }
  }

  test("the one-shuffle hop survives label rewrites: hop 2 matches hop 1") {
    val (sym, labels) = loopFixture()
    // the loop's rewrite: persist the hop output, drop the flag — the
    // doc_id partitioning must ride through the cached join plan so
    // hop 2 plans the same one-shuffle shape (this is what makes the
    // WHOLE loop 1 shuffle/hop, not just its first iteration)
    val next = Dedup.hopNext(labels, sym).persist()
    try {
      next.count()
      val labels2 = next.drop("__changed")
      val (n, plan) = shuffles(Dedup.hopNext(labels2, sym))
      assert(n === 1, s"hop 2 lost the persisted partitioning:\n$plan")
    } finally { sym.unpersist(); labels.unpersist(); next.unpersist() }
  }

  test("hop after a lineage truncation still shuffles exactly once (static-planner loop)") {
    // clustersOver's loop runs with AQE OFF (r12): under the static
    // planner a bare localCheckpoint CAPTURES the hop output's
    // doc_id-hash partitioning — no repartition, no extra cache — and
    // the next hop stays one-shuffle. (Under AQE the same checkpoint
    // reports UnknownPartitioning and the hop re-exchanges the label
    // side — the r11 finding that used to force a
    // checkpoint+repartition+persist cycle per truncation.)
    graft.engine.Tables.withAqeOff(spark) {
      val (sym, labels) = loopFixture()
      val next = Dedup.hopNext(labels, sym).persist()
      val truncated = next.drop("__changed").localCheckpoint()
      try {
        next.unpersist()
        val (nSh, plan) = shuffles(Dedup.hopNext(truncated, sym))
        assert(nSh === 1,
          s"the post-truncation hop lost the checkpoint-captured partitioning:\n$plan")
      } finally {
        sym.unpersist(); labels.unpersist(); next.unpersist()
      }
    }
  }

  test("the full hop is one shuffle under the static planner too (the loop's regime)") {
    graft.engine.Tables.withAqeOff(spark) {
      val (sym, labels) = loopFixture()
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val (n, plan) = shuffles(Dedup.hopNext(labels, sym))
        assert(n === 1,
          s"static-planner hop over pre-partitioned persisted relations " +
            s"must shuffle only for the min-label aggregate, saw $n:\n$plan")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        sym.unpersist(); labels.unpersist()
      }
    }
  }

  test("deep loop runs all 10 hops with exact labels and a FLAT per-hop plan") {
    import spark.implicits._
    // a 20-node path runs the FULL 10-hop budget (diameter 19, no
    // convergence) — the depth regime that OOM'd the driver at 10x
    // when the per-hop plan was allowed to grow. Depth-bounded
    // min-label semantics on a path: label(i) after 10 hops =
    // max(1, i - 10), keeper = node 1 only.
    val nodes = (1L to 20L).toDF("doc_id")
    val edges = (1L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    // observe plan size DURING the loop via the onHop seam — the
    // RESULT is always a frozen LogicalRDD scan, so asserting on it
    // alone is vacuous (r11 advice)
    val sizes = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val out = Dedup.clustersOver(nodes, edges, maxHops = 10,
      onHop = (hop, labels) =>
        sizes += hop -> labels.queryExecution.optimizedPlan.toString.length)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val want = (1L to 20L).map(i => (i, math.max(1L, i - 10L), i == 1L))
    assert(got.toSeq === want)
    assert(sizes.map(_._1) === (0 until 10), "path-19 must run all 10 hops")
    // every hop's label frame is an eagerly-frozen LogicalRDD, so the
    // plan is CONSTANT-size across the whole loop: no hop may exceed
    // 2x the first hop's (without the per-hop freeze the plan doubles
    // per hop — hop 9 would be ~2^9 subtree copies)
    val first = sizes.head._2
    assert(sizes.map(_._2).max <= first * 2,
      s"per-hop plan must stay flat: ${sizes.mkString(", ")}")
  }

  test("a hop-budget that converges early exits with exact labels (4-hop cap)") {
    import spark.implicits._
    val nodes = (1L to 20L).toDF("doc_id")
    val edges = (1L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val hops = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = Dedup.clustersOver(nodes, edges, maxHops = 4,
      onHop = (hop, _) => hops += hop)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val want = (1L to 20L).map(i => (i, math.max(1L, i - 4L), i == 1L))
    assert(got.toSeq === want, "4-hop depth-bounded labels")
    assert(hops.toSeq === Seq(0, 1, 2, 3), "the cap must bound the walk at 4 hops")
  }

  test("triangles adjacency joins reuse the persisted src partitioning without broadcast") {
    import spark.implicits._
    // layout-shaped input: (doc_a, doc_b, deg_a, deg_b) — a K4 plus a
    // pendant, degrees carried like the span-pair layout does
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val deg = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val pairsDeg = pairs.map(p => (p._1, p._2, deg(p._1), deg(p._2)))
      .toDF("doc_a", "doc_b", "deg_a", "deg_b")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (n, plan) = shuffles(graft.operators.Graph.trianglesOverDeg(pairsDeg))
      // r15 edge-iterator shape: the src-side adjacency fold AND the
      // src join both reuse the persisted src partitioning (exchange-
      // free); the remaining exchanges are the dst-side re-key of the
      // edge+nbrs stream, the count hash, and the output range — a
      // checkpointed oriented relation loses the partitioning under
      // AQE and this climbs back up
      assert(n === 3,
        s"triangles must shuffle only for the dst-side join re-key, the " +
          s"count, and the output order, saw $n exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("blocked postings checkpoint at full task width for the pair join") {
    val dir = "/root/testdata/sf0.001"
    val kb = EntityResolution.blockedPostings(
      spark, EntityResolution.mentions(spark, dir))
    // the pair self-join probes this relation; its partition count
    // bounds the DP parallelism (r11: a fixture-sized posting relation
    // inherited the scan's 1-2 partitions and scored at 4/32 cores)
    assert(kb.rdd.getNumPartitions ===
      spark.sessionState.conf.numShufflePartitions,
      "postings must spread across the full task width before the checkpoint")
  }
}
