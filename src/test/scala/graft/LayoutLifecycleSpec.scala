package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Layouts
import graft.operators.{Dedup, Graph}

/** The WHOLE-SESSION lifecycle of the derive-once layout mechanism
  * ([[Layouts.layoutOnce]]): derive → serve (cached) → fixture change
  * at the SAME path → invalidate → re-derive, across two fixtures at
  * once, with the temp-dir accounting bounded by [[Layouts.dropLayouts]].
  * Individual layout families pin derive-vs-live row equality in their
  * own suites; this spec pins the MECHANISM — above all that a
  * regenerated fixture can never be served a stale layout, including
  * through a COMPOSED consumer (the incremental-components query reads
  * two stacked layouts: span pairs + the base label store).
  */
class LayoutLifecycleSpec extends SparkSpec {

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def writeFixture(fixDir: String, parity: Int): Unit = {
    import spark.implicits._
    graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" % 2 === parity)
      .write.mode("overwrite").parquet(s"$fixDir/documents.parquet")
  }

  test("derive, serve, invalidate on fixture change, re-derive, drop — no stale reads") {
    import spark.implicits._
    val staticDir = "/root/testdata/sf0.001"
    val fixDir = java.nio.file.Files
      .createTempDirectory("graft-lifecycle-fix").toString
    writeFixture(fixDir, parity = 0)

    // ---- derive + serve on BOTH fixtures ----
    val mutableGen1 = Graph.spanPairsLayout(spark, fixDir)
    val gen1Files = mutableGen1.inputFiles.toSet
    assert(gen1Files.nonEmpty)
    // second lookup serves the SAME materialization (no re-derive)
    assert(Graph.spanPairsLayout(spark, fixDir).inputFiles.toSet === gen1Files)
    val staticFiles = Graph.spanPairsLayout(spark, staticDir).inputFiles.toSet
    assert(staticFiles.nonEmpty && (staticFiles !== gen1Files))
    val gen1Rows = rows(mutableGen1)
    // the stacked consumer: base-label store layout + incremental query
    val store1Files = Graph.baseLabelStoreLayout(spark, fixDir).inputFiles.toSet
    val inc1 = rows(Graph.componentsIncremental(spark, fixDir))
    assert(inc1.nonEmpty)

    // ---- fixture change: regenerate files at the SAME path ----
    writeFixture(fixDir, parity = 1)

    // no stale reads: the next lookup re-derives from the new files
    val mutableGen2 = Graph.spanPairsLayout(spark, fixDir)
    assert(mutableGen2.inputFiles.toSet !== gen1Files,
      "regenerated fixture served the stale layout materialization")
    val gen2Rows = rows(mutableGen2)
    assert(gen2Rows !== gen1Rows,
      "re-derived layout still carries the old fixture's rows")
    // the untouched fixture keeps serving its cached materialization
    assert(Graph.spanPairsLayout(spark, staticDir).inputFiles.toSet === staticFiles,
      "a fixture change must only invalidate ITS OWN layouts")
    // the composed consumer re-derives BOTH stacked layouts and lands
    // exactly where a from-scratch converged recompute over the new
    // fixture's edges lands
    assert(Graph.baseLabelStoreLayout(spark, fixDir).inputFiles.toSet
      !== store1Files)
    val inc2 = rows(Graph.componentsIncremental(spark, fixDir))
    assert(inc2 !== inc1)
    val pairs2 = mutableGen2.select($"doc_a", $"doc_b")
    val nodes2 = pairs2.select($"doc_a".as("doc_id"))
      .union(pairs2.select($"doc_b")).distinct()
    assert(inc2 === rows(Dedup.clustersOver(nodes2,
      pairs2.select($"doc_a".as("src"), $"doc_b".as("dst")),
      Dedup.MaintenanceMaxHops)))

    // ---- accounting + drop: the eviction half ----
    // both generations of the mutable fixture are still held (the old
    // fingerprint's entry was superseded, not freed) — that is exactly
    // what dropLayouts exists to reclaim between fixtures
    val held = Layouts.layoutAccounting(spark)
    assert(held.count(_._1.contains("|span-pairs|" + fixDir + "|")) === 2,
      s"expected two held generations, got:\n${held.mkString("\n")}")
    held.foreach { case (_, bytes) => assert(bytes > 0L) }
    val freedSpan = Layouts.dropLayouts(spark, "span-pairs")
    val freedStore = Layouts.dropLayouts(spark, "inc-base-labels")
    assert(freedSpan.map(_._2).sum > 0L && freedStore.map(_._2).sum > 0L)
    val after = Layouts.layoutAccounting(spark)
    assert(!after.exists(e => e._1.contains("|span-pairs|")
      || e._1.contains("|inc-base-labels|")),
      s"dropped families still accounted:\n${after.mkString("\n")}")
    // dropped directories are really gone from disk
    (freedSpan ++ freedStore).foreach { case (key, _) => assert(key.nonEmpty) }

    // a post-drop lookup re-derives fresh (the drop is not a poison)
    val reborn = Graph.spanPairsLayout(spark, fixDir)
    assert(reborn.inputFiles.nonEmpty
      && (reborn.inputFiles.toSet !== mutableGen2.inputFiles.toSet))
    assert(rows(reborn) === gen2Rows)
  }
}
