package graft

import graft.operators.Corpus

/** Invariants for the corpus-management operators (the DuckDB oracle
  * covers exact values; these pin the properties a pipeline relies on).
  */
class CorpusSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def total: Long =
    graft.engine.Tables.load(spark, dir, "documents").count()

  test("deterministic sample is rerun-stable and roughly 1-in-k") {
    val s1 = Corpus.sample(spark, dir).collect().map(_.getLong(0)).toSeq
    val s2 = Corpus.sample(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(s1 === s2)
    val frac = s1.size.toDouble / total
    assert(frac > 0.03 && frac < 0.25, s"sample fraction $frac far from 1/10")
  }

  test("split assignment partitions the corpus with content-stable buckets") {
    val rows = Corpus.splitAssign(spark, dir).collect()
    assert(rows.length === total)
    val bySplit = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b < 100)
      val expected = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(r.getString(2) === expected)
    }
  }

  test("packed batches are contiguous per language and near the token budget") {
    val rows = Corpus.packBatches(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val byBatch = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val ids = byBatch.keys.toSeq.sorted
      // batch ids are dense from 0
      assert(ids === (0L until ids.length).toSeq)
      val maxDoc = docs.map(_._3).max
      // contiguous fill: every batch holds less than budget + one
      // straddling doc, and every non-final batch reaches the budget
      byBatch.foreach { case (_, tokens) => assert(tokens < Corpus.PackBudget + maxDoc) }
      ids.dropRight(1).foreach { b => assert(byBatch(b) >= Corpus.PackBudget - maxDoc) }
    }
  }

  test("contamination never flags benchmark docs and only flags true head collisions") {
    val heads = graft.engine.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "md5(array_join(slice(split(text, ' '), 1, 5), ' ')) AS h")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val benchHeads = heads.collect { case (id, h) if id % Corpus.BenchMod == 0 => h }.toSet
    val flagged = Corpus.contamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    flagged.foreach { case (id, h) =>
      assert(id % Corpus.BenchMod != 0)
      assert(benchHeads.contains(h))
      assert(heads(id) === h)
    }
    // completeness: every non-bench doc whose head is in the bench set is flagged
    val expected = heads.collect {
      case (id, h) if id % Corpus.BenchMod != 0 && benchHeads.contains(h) => id
    }.toSet
    assert(flagged.map(_._1).toSet === expected)
  }
}
