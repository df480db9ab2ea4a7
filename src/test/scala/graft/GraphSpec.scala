package graft

import graft.operators.Graph

/** Exact fixtures for the graph operators: tiny hand-computed graphs
  * pin every integer of the mass-passing arithmetic (the DuckDB oracle
  * re-derives the corpus-scale values independently).
  */
class GraphSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def pairsOf(ps: (Long, Long)*) = {
    import spark.implicits._
    ps.toDF("doc_a", "doc_b")
  }

  test("graph queries share one materialized span-pair layout per session, scan-only") {
    // derive-once, scan-many: two lookups return the SAME materialized
    // files (the second call must not re-derive or re-write), and the
    // frame every graph consumer starts from is a bare parquet scan —
    // no winnow kernel, no posting-list expansion in its plan
    val a = Graph.spanPairsLayout(spark, dir)
    val b = Graph.spanPairsLayout(spark, dir)
    assert(a.inputFiles.nonEmpty)
    assert(a.inputFiles.toSet === b.inputFiles.toSet,
      "second lookup materialized a new layout instead of reusing")
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"not a scan:\n$plan")
    assert(!plan.contains("graft_winnow") && !plan.contains("Generate"),
      s"layout read re-derives the span graph:\n$plan")
  }

  test("family profile reads component labels from a derive-once layout, scan-only") {
    // the CC loop runs once per session (the layout's first lookup);
    // the report's own plan is then a parquet scan + join + aggregate —
    // no LogicalRDD from a fresh loop, no re-derivation (the equality
    // of the layout against a LIVE components() run is pinned by
    // "family profile aggregates every component member exactly once")
    val a = Graph.componentLabelsLayout(spark, dir)
    val b = Graph.componentLabelsLayout(spark, dir)
    assert(a.inputFiles.nonEmpty)
    assert(a.inputFiles.toSet === b.inputFiles.toSet,
      "second lookup re-iterated the components loop")
    val plan = Graph.familyProfile(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"not a scan:\n$plan")
    assert(!plan.contains("LogicalRDD") && !plan.contains("ExistingRDD"),
      s"family profile re-ran the loop instead of scanning the layout:\n$plan")
  }

  test("pagerank on a triangle is the exact fixed point (uniform mass forever)") {
    val got = Graph.pagerankOver(pairsOf((1L, 2L), (1L, 3L), (2L, 3L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // K3: each node deg 2; each round every node receives
    // 2 · ((10⁶·17) div 40) = 850000 plus teleport 150000 = 10⁶ again.
    assert(got.toSeq === Seq((1L, 2L, 1000000L), (2L, 2L, 1000000L), (3L, 2L, 1000000L)))
  }

  test("pagerank on a 3-path matches the hand-unrolled 5 iterations exactly") {
    val got = Graph.pagerankOver(pairsOf((1L, 2L), (2L, 3L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Hand-unrolled integer masses (teleport 150000, damping 17/20):
    // m1=(575000,1850000,575000), m2=(936250,1127500,936250),
    // m3=(629187,1741624,629187), m4=(890190,1219616,890190),
    // m5=(668336,1663322,668336) — truncating div at every hop.
    assert(got.toSeq === Seq((1L, 1L, 668336L), (2L, 2L, 1663322L), (3L, 1L, 668336L)))
  }

  test("triangle membership counts on a diamond (two shared-edge triangles)") {
    val got = Graph.trianglesOver(
      pairsOf((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Triangles {1,2,3} and {2,3,4}: docs 2 and 3 sit in both.
    assert(got.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("layout-served components equal the live min-label loop, via a scan-only plan") {
    // r14 serving shape: the surfaced query reads the derive-once
    // label layout (CC labels are an ingest-time artifact; the live
    // loop's p99 belongs to ingest, not serving). The equality here is
    // what makes that substitution safe, and the plan check is what
    // makes it a BOUND: a scan has no per-hop checkpoint loop to
    // tail-spike.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val served = Graph.components(spark, dir)
    assert(rows(served) === rows(Graph.componentsLoop(spark, dir)))
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"not a layout scan:\n$plan")
    assert(!plan.contains("LogicalRDD") && !plan.contains("ExistingRDD"),
      s"serving query re-ran the loop instead of scanning the layout:\n$plan")
  }

  test("components partition the span-linked docs with min-id labels and one keeper each") {
    val rows = Graph.components(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val nodes = Graph.pagerank(spark, dir).collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet === nodes, "same node set as pagerank")
    rows.foreach { case (id, label, keeper) =>
      assert(label <= id, "min-label propagation can only lower labels")
      assert(keeper === (id == label))
    }
    val labels = rows.map(_._2).toSet
    assert(rows.count(_._3) === labels.size, "exactly one keeper per component")
    assert(labels.subsetOf(rows.map(_._1).toSet), "every label is a member doc")
  }

  test("label propagation on a barbell keeps the two cliques as two communities") {
    // two triangles {1,2,3} and {10,11,12} bridged by edge 3-10:
    // neighbour-majority with min-label ties must keep the cliques
    // separate (components would merge them into one family)
    val got = Graph.labelPropOver(pairsOf(
      (1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val comm = got.map(t => t._1 -> t._2).toMap
    assert(comm(1L) === comm(2L) && comm(2L) === comm(3L))
    assert(comm(10L) === comm(11L) && comm(11L) === comm(12L))
    assert(comm(1L) !== comm(10L), "bridge must not merge the cliques")
    got.foreach { case (id, c, n) => assert(n === 3L, s"doc $id community $c") }
  }

  test("corpus label propagation matches a driver simulation of the synchronous rounds") {
    val pairs = graft.operators.TextAnalysis.sharedSpans(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var lab: Map[Long, Long] = nbrs.keys.map(k => k -> k).toMap
    for (_ <- 1 to Graph.LabelPropIters) {
      lab = nbrs.map { case (node, ns) =>
        val counts = ns.map(lab).groupBy(identity).view.mapValues(_.size).toSeq
        node -> counts.minBy { case (l, n) => (-n, l) }._1
      }
    }
    val sizes = lab.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Graph.labelProp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === lab.size)
    got.foreach { case (id, c, n) =>
      assert(c === lab(id), s"community of doc $id")
      assert(n === sizes(lab(id)), s"community size of doc $id")
    }
    // communities refine components: strictly more (or equal) groups
    val nComponents = Graph.components(spark, dir)
      .select("cluster_id").distinct().count()
    assert(sizes.size >= nComponents)
  }

  test("degree histogram accounts every linked doc with exact log2 bins") {
    val pr = Graph.pagerank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = pr.values.groupBy(d => (1 to 62).count(i => (1L << i) <= d).toLong)
      .map { case (bin, ds) => bin -> (ds.size.toLong, ds.sum, ds.max) }
    val got = Graph.degreeHisto(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === pr.size.toLong, "every linked doc binned")
  }

  test("weighted pagerank on a weighted 3-path matches the hand-unrolled rounds") {
    import spark.implicits._
    val got = Graph.pagerankWeightedOver(
      Seq((1L, 2L, 1L), (2L, 3L, 3L)).toDF("doc_a", "doc_b", "w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // strengths (1, 4, 3); 5 rounds of (mass·17·w) div (20·s) hop
    // arithmetic, simulated independently in exact integers
    assert(got.toSeq === Seq((1L, 1L, 409168L), (2L, 4L, 1663322L), (3L, 3L, 927505L)))
  }

  test("weighted pagerank with unit weights equals unweighted pagerank") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (2L, 5L))
    val un = Graph.pagerankOver(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val wt = Graph.pagerankWeightedOver(
      pairs.map { case (a, b) => (a, b, 1L) }.toDF("doc_a", "doc_b", "w"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(wt.toSeq === un.toSeq)
  }

  test("degree-oriented triangles equal a brute-force count on a hub-heavy graph") {
    // hub 1 linked to everyone (degree 7), plus a clique {2,3,4} and
    // edge (5,6): triangles (1,2,3) (1,2,4) (1,3,4) (2,3,4) (1,5,6)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L), (1L, 7L),
      (2L, 3L), (2L, 4L), (3L, 4L), (5L, 6L))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b && adj(a)(b)
      c <- nodes if b < c && adj(a)(c) && adj(b)(c)
    } yield Seq(a, b, c)).flatten.groupBy(identity)
      .map { case (d, xs) => d -> xs.size.toLong }
    val got = Graph.trianglesOver(pairsOf(edges: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === brute)
  }

  test("family profile aggregates every component member exactly once") {
    val comp = Graph.components(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = comp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val prof = Graph.familyProfile(spark, dir).collect()
    assert(prof.map(_.getLong(0)).toSet === byCluster.keySet)
    prof.foreach { r =>
      assert(r.getLong(1) === byCluster(r.getLong(0)), "n_members per cluster")
      assert(r.getLong(2) >= 1L && r.getLong(3) >= 1L)
      assert(r.getLong(5) >= r.getLong(1), "total tokens >= one per member")
      assert(r.getLong(7) <= r.getLong(6), "max_chars <= total_chars")
    }
    assert(prof.map(_.getLong(1)).sum === comp.length.toLong)
  }

  test("corpus pagerank covers exactly the span-linked docs, above teleport mass") {
    val pr = Graph.pagerank(spark, dir).collect()
    assert(pr.nonEmpty, "span graph should be non-empty at sf0.001")
    val linked = graft.operators.TextAnalysis.sharedSpans(spark, dir)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pr.map(_.getLong(0)).toSet === linked)
    pr.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getLong(2) >= Graph.TeleportMass)
    }
  }

  test("common neighbors scores exactly the non-edges of a diamond") {
    val got = Graph.commonNeighborsOver(
      pairsOf((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // Only non-edge: (1,4); common neighbours {2,3} → 2; deg(1)=2,
    // deg(4)=2 → jaccard = 2·10⁶ div (2+2−2) = 10⁶.
    assert(got.toSeq === Seq((1L, 4L, 2L, 2L, 2L, 1000000L)))
  }

  test("kcore peels a 3-round cascade down to the exact K4 core") {
    // K4 {1,2,3,4} + path 5(-1,-2,-6) + 6(-7,-8): 7,8 peel first
    // (deg 1), stranding 6 (→1), then 5 (→2) — three cascading
    // rounds, well inside the bounded count
    val got = Graph.kcoreOver(pairsOf(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (2L, 5L), (5L, 6L), (6L, 7L), (6L, 8L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 4L, 3L), (2L, 4L, 3L), (3L, 3L, 3L), (4L, 3L, 3L)))
  }

  test("kcore of a triangle-free sparse graph is empty") {
    // a path has no 3-core
    assert(Graph.kcoreOver(pairsOf((1L, 2L), (2L, 3L), (3L, 4L)))
      .collect().isEmpty)
  }

  test("common neighbors excludes hub centers above the degree cap") {
    // star: hub 100 linked to 1..70 (deg 70 > cap) — every leaf pair is
    // co-linked ONLY through the hub, so no candidate survives
    val star = (1L to 70L).map(i => (i, 100L))
    assert(Graph.commonNeighborsOver(pairsOf(star: _*)).collect().isEmpty)
    // with 3 leaves (deg 3 ≤ cap) all 3 leaf pairs score 1 common
    val small = Graph.commonNeighborsOver(
      pairsOf((1L, 100L), (2L, 100L), (3L, 100L))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(small.toSeq === Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }
}
