package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

class EntityResolutionSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("every planted mention is matched and uppercase noise matches exactly") {
    import spark.implicits._
    val m = EntityResolution.matchMentions(spark, dir).cache()
    val n = m.count()
    assert(n > 0)
    // two-word color/noun names always share a key with their catalog
    // entity under every corruption class — nothing may go unmatched
    assert(m.filter($"matched_id".isNull).count() === 0)
    // case folding makes uppercase corruption free: dist 0, correct
    val upper = m.filter($"mention_id" % 3 === 1)
    assert(upper.count() > 0)
    assert(upper.filter(!$"correct" || $"dist" =!= 0L).count() === 0)
    // dropped-char mentions sit exactly 1 edit from their truth, and
    // the nearest candidate can never be further than that
    val dropped = m.filter($"mention_id" % 3 === 0)
    assert(dropped.filter($"dist" > 1L).count() === 0)
    m.unpersist()
  }

  test("match quality partitions the mention set and bounds accuracy") {
    import spark.implicits._
    val q = EntityResolution.matchQuality(spark, dir).collect()
    assert(q.map(_.getAs[String]("noise_class")).sorted ===
      Array("drop_char", "uppercase", "word_reverse"))
    val total = q.map(_.getAs[Long]("n_mentions")).sum
    assert(total === EntityResolution.matchMentions(spark, dir).count())
    q.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_mentions"))
      assert(r.getAs[Long]("acc_ppm") ===
        r.getAs[Long]("n_correct") * 1000000L / r.getAs[Long]("n_mentions"))
    }
    // uppercase class must be perfectly recovered
    val up = q.find(_.getAs[String]("noise_class") == "uppercase").get
    assert(up.getAs[Long]("n_correct") === up.getAs[Long]("n_mentions"))
    // the report reads the derive-once matches layout: scan + rollup,
    // no blocked re-scoring. The layout must serve EXACTLY the live
    // scoring pass's rows (the DedupDifferentialSpec cluster-label
    // standard), not just matching counts
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("mention_id").collect().map(_.toSeq).toSeq
    assert(rows(EntityResolution.matchesLayout(spark, dir)) ===
      rows(EntityResolution.matchMentions(spark, dir)))
    val again = EntityResolution.matchesLayout(spark, dir)
    assert(again.inputFiles.nonEmpty &&
      again.inputFiles.toSet === EntityResolution.matchesLayout(spark, dir).inputFiles.toSet,
      "second lookup re-ran the blocked scoring")
    val plan = EntityResolution.matchQuality(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") && !plan.contains("levenshtein"),
      s"quality report must not re-score:\n$plan")
  }

  test("block profile pair fan-out is entities x mentions and the cap is honest") {
    import spark.implicits._
    val p = EntityResolution.blockProfile(spark, dir).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      assert(r.getAs[Long]("n_pairs") ===
        r.getAs[Long]("n_entities") * r.getAs[Long]("n_mentions"))
      assert(r.getAs[Boolean]("kept") ===
        (r.getAs[Long]("n_entities") <= EntityResolution.ErMaxBlock))
    }
    // corrupted last words (dropped char) produce mention-only keys
    assert(p.exists(r => r.getAs[Long]("n_entities") === 0L))
  }

  test("mention clustering merges an entity's case/char noise but not its reversals") {
    import spark.implicits._
    import org.apache.spark.sql.functions.countDistinct
    val labels = EntityResolution.clusterMentions(spark, dir)
    // rebuild (mention_id -> true_name, class) to audit the clusters
    val truth = graft.engine.Tables.load(spark, dir, "part")
      .select($"p_partkey".as("mention_id"), $"p_name".as("true_name"),
        ($"p_partkey" % 3).as("cls"))
    val j = labels.join(truth, Seq("mention_id")).cache()
    // within one entity, every drop-char (cls 0) and uppercase (cls 1)
    // mention shares a single cluster (dist <= 1 between all of them)
    val perEntity = j.filter($"cls" =!= 2)
      .groupBy($"true_name").agg(countDistinct($"cluster_id").as("nc"))
    assert(perEntity.count() > 0)
    assert(perEntity.filter($"nc" =!= 1L).count() === 0,
      "case/char noise of one entity must resolve to one cluster")
    // edit distance cannot see a transposition DIRECTLY, so at least
    // part of the reversed population must split from its entity's
    // case/char cluster (some reversals still merge TRANSITIVELY via
    // cross-entity short-distance chains — that leakage is the
    // documented threshold tradeoff, so "never joins" would be wrong)
    val revSplit = j.filter($"cls" === 2).select($"true_name", $"cluster_id")
      .join(j.filter($"cls" =!= 2).select($"true_name", $"cluster_id"),
        Seq("true_name", "cluster_id"), "left_anti")
    assert(revSplit.count() > 0,
      "no reversed mention split off — the distance bar is not doing anything")
    j.unpersist()
  }

  test("nearest-candidate election compiles to WindowGroupLimit") {
    val plan = EntityResolution.matchMentions(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-mention rank-1 must run as map-side top-1 heaps, got:\n$plan")
  }

  test("erEnrich refuses a catalog past the literal-expression cap, loudly") {
    import spark.implicits._
    val mentions = Seq((1L, "alpha")).toDF("mention_id", "mention")
    val oversized = (0 to EntityResolution.ErEnrichMaxCatalog)
      .map(i => (i.toLong, s"entity $i"))
    val e = intercept[IllegalArgumentException] {
      EntityResolution.erEnrich(mentions, oversized)
    }
    // the error must carry the cap AND point at the blocked-join path
    assert(e.getMessage.contains(EntityResolution.ErEnrichMaxCatalog.toString))
    assert(e.getMessage.contains("er_match"))
    // a catalog AT the cap is the accepted contract — pin the boundary
    // itself (an off-by-one in the require must fail here), without
    // paying execution of the 10k-literal plan
    val atCap = (1 to EntityResolution.ErEnrichMaxCatalog)
      .map(i => (i.toLong, s"entity $i"))
    EntityResolution.erEnrich(mentions, atCap)
    // and the small-catalog path still elects the nearest entity
    val ok = EntityResolution.erEnrich(mentions,
      Seq((7L, "alpha"), (9L, "alphz")))
    assert(ok.select("matched_id").head.getLong(0) === 7L)
  }
}
