package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** End-to-end pipeline invariants (the DuckDB oracle pins exact stage
  * counts and the packed frame; these pin the properties the oracle
  * can't express).
  */
class PipelineSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("funnel counts are monotone non-increasing and run covers all stages") {
    val (out, funnel) = Pipeline.run(spark, dir)
    assert(funnel.map(_.stage) ===
      Seq("input", "quality_filter", "exact_dedup", "decontaminate", "stratify", "packed"))
    funnel.sliding(2).foreach { case Seq(a, b) =>
      assert(b.docs <= a.docs, s"funnel grew: ${a.stage}=${a.docs} -> ${b.stage}=${b.docs}")
    }
    assert(funnel.last.docs === funnel(4).docs,
      "packing must keep every stratify survivor")
    assert(out.count() === funnel.last.docs)
  }

  test("funnel DataFrame agrees with run()'s counts") {
    val (_, fromRun) = Pipeline.run(spark, dir)
    val rows = Pipeline.funnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === (0L to 5L))
    assert(rows.map(r => r._2 -> r._3).toMap ===
      fromRun.map(s => s.stage -> s.docs).toMap)
  }

  test("batches pack the SURVIVOR set: every non-final batch is full to within one doc") {
    import spark.implicits._
    val packed = Pipeline.packed(Pipeline.stages(spark, dir).last._2)
      .select($"lang", $"batch", $"n_tokens")
      .as[(String, Long, Long)].collect()
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (lang, docs) =>
      val maxDoc = docs.map(_._3).max
      val byBatch = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val ids = byBatch.keys.toSeq.sorted
      assert(ids === (0L until ids.length).toSeq, s"$lang batch ids not dense from 0")
      // contiguous survivor fill: a batch only closes once the budget is
      // reached, so every non-final batch holds >= budget - one straddler
      ids.dropRight(1).foreach { b =>
        assert(byBatch(b) >= Corpus.PackBudget - maxDoc,
          s"$lang batch $b under-filled: ${byBatch(b)} tokens (budget ${Corpus.PackBudget})")
      }
      byBatch.foreach { case (b, tokens) =>
        assert(tokens < Corpus.PackBudget + maxDoc, s"$lang batch $b over-filled: $tokens")
      }
    }
  }

  test("packed batch ids differ from full-corpus packing (survivor tokens only)") {
    import spark.implicits._
    val survivors = Pipeline.stages(spark, dir).last._2
    val survivorIds = survivors.select($"doc_id").as[Long].collect().toSet
    val full = Corpus.packBatches(spark, dir)
      .select($"doc_id", $"batch").as[(Long, Long)].collect().toMap
    val packed = Pipeline.packed(survivors)
      .select($"doc_id", $"batch").as[(Long, Long)].collect().toMap
    assert(packed.keySet === survivorIds)
    // dropped documents no longer consume budget, so survivor batch ids
    // must compact downward (never exceed the full-corpus id)
    packed.foreach { case (id, b) => assert(b <= full(id)) }
    assert(packed.exists { case (id, b) => b < full(id) },
      "expected at least one batch id to compact after upstream drops")
  }

  test("incremental funnel composes the oracle-checked stage operators exactly") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val d = graft.engine.Tables.load(spark, dir, "documents")
    val rows = Pipeline.incrementalFunnel(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rows.keySet === Set("batch", "quality_filter", "incremental_dedup", "decontaminate"))
    // stage 0: the incoming batch is exactly the odd half
    assert(rows("batch") === d.filter($"doc_id" % 2 === 1).count())
    // stage 1: batch ∩ quality keepers
    val keep = graft.operators.TextAnalysis.filterDocs(spark, dir)
      .filter($"keep").select($"doc_id")
    val s1 = d.filter($"doc_id" % 2 === 1).join(keep, Seq("doc_id"), "left_semi")
    assert(rows("quality_filter") === s1.count())
    // stage 2: survivors novel vs the even-half store (same counts as
    // the independently-tested Dedup.incremental)
    val store = d.filter($"doc_id" % 2 === 0).select(md5($"text").as("fingerprint"))
    val novel = graft.operators.Dedup.incremental(store, s1.select($"doc_id", $"text"))
    assert(rows("incremental_dedup") === novel.count())
    // monotone funnel
    assert(rows("batch") >= rows("quality_filter") &&
      rows("quality_filter") >= rows("incremental_dedup") &&
      rows("incremental_dedup") >= rows("decontaminate"))
    assert(rows("decontaminate") > 0)
  }
}
