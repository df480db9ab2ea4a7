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
}
