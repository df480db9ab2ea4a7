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

  test("nearest-candidate election folds over collected candidate arrays") {
    val plan = EntityResolution.matchMentions(spark, dir)
      .queryExecution.executedPlan.toString
    // r15: collect_set + banded fold replaced the pair-row
    // WindowGroupLimit election (one exchange fewer, threshold-banded
    // levenshtein instead of the full DP table per pair)
    assert(plan.contains("collect_set"),
      s"per-mention election must fold over collected candidates, got:\n$plan")
    assert(!plan.contains("Window"),
      s"the pair-row window election was retired in r15, got:\n$plan")
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

  // ---- tombstone face (r14 verdict #1) ----

  test("upsertCatalog applies deletes, upserts, and a delete-then-re-add") {
    import spark.implicits._
    val cat = Seq(("alpha one", 1L), ("beta two", 2L), ("gamma three", 3L))
      .toDF("ent_name", "ent_id")
    val delta = Seq((2L, null: String, true), (3L, "gamma renamed", false),
        (4L, "delta four", false))
      .toDF("ent_id", "ent_name", "deleted")
    val applied = EntityResolution.upsertCatalog(cat, delta)
      .collect().map(r => (r.getLong(1), r.getString(0))).sorted.toSeq
    assert(applied === Seq((1L, "alpha one"), (3L, "gamma renamed"),
      (4L, "delta four")))
    // re-add of a previously deleted id is an ordinary upsert
    val readd = Seq((2L, "beta reborn", false)).toDF("ent_id", "ent_name", "deleted")
    val applied2 = EntityResolution.upsertCatalog(
        EntityResolution.upsertCatalog(cat, delta), readd)
      .collect().map(r => (r.getLong(1), r.getString(0))).sorted.toSeq
    assert(applied2.contains((2L, "beta reborn")))
    // a 2-column delta (upsert-only producer) still applies
    val up2 = Seq(("alpha renamed", 1L)).toDF("ent_name", "ent_id")
    assert(EntityResolution.upsertCatalog(cat, up2)
      .filter($"ent_id" === 1L).head.getString(0) === "alpha renamed")
  }

  test("a deleted entity's danglers re-verdict even with zero key overlap — the matched_id face") {
    import spark.implicits._
    // an erEnrich-style store can hold a verdict across ZERO shared
    // tokens (no blocking): mention "zzz qqq" matched to entity 1
    // ("alpha one"). Deleting entity 1 must re-verdict that mention —
    // reachable ONLY through the stored matched_id, never a key.
    val cat = Seq(("alpha one", 1L), ("beta two", 2L)).toDF("ent_name", "ent_id")
    val del = Seq((1L, null: String, true)).toDF("ent_id", "ent_name", "deleted")
    val m = Seq((10L, "zzz qqq", "zzz qqq", 1L), (11L, "beta two", "beta two", 2L))
      .toDF("mention_id", "true_name", "mention", "matched_id")
    val rv = EntityResolution.reverdicts(m, cat, del)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).sortBy(_._1).toSeq
    // mention 10: affected via matched_id; shares no key with the
    // shrunk catalog → re-verdicts to the NULL match (unmatched
    // allowed). mention 11: untouched entity, not affected.
    assert(rv === Seq((10L, None)))
    // WITHOUT the stored matched_id the face is unreachable — the
    // key-overlap set alone misses the dangler (pins why the face
    // exists; verdicts from the BLOCKED matcher are provably covered
    // by key overlap, a non-blocked seed is not)
    val rvNoStore = EntityResolution.reverdicts(
      m.select($"mention_id", $"true_name", $"mention"), cat, del)
      .collect().map(_.getLong(0)).toSeq
    assert(rvNoStore === Seq.empty)
    // the RENAME face of the same hazard (r15 review): a rename moves
    // the stored dist/correct out from under a keyless verdict exactly
    // like a delete dangles its id — the stored-verdict face covers
    // ANY changed entity, not only deletes. Entity 1 renamed to a
    // name sharing no tokens with anything: mention 10 must re-score
    // (here to the null match — under BLOCKED re-scoring it shares no
    // key with the renamed catalog; what matters is the stale
    // dist/correct row is replaced, not served forever)
    val ren = Seq((1L, "totally different", false))
      .toDF("ent_id", "ent_name", "deleted")
    val rvRen = EntityResolution.reverdicts(m, cat, ren)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).sortBy(_._1).toSeq
    assert(rvRen === Seq((10L, None)),
      "the renamed entity's keyless dangler must be re-scored")
  }

  test("tombstone re-verdicts elect the surviving nearest and allow the null match") {
    import spark.implicits._
    val cat = Seq(("alpha one", 1L), ("alpha uno", 2L), ("omega far", 3L))
      .toDF("ent_name", "ent_id")
    val m = Seq((10L, "alpha one", "alpha one"), (11L, "omega far", "omega far"))
      .toDF("mention_id", "true_name", "mention")
    // delete the exact match: the mention re-elects the surviving
    // block-mate (shares the "alpha" key)
    val d1 = Seq((1L, null: String, true)).toDF("ent_id", "ent_name", "deleted")
    val rv1 = EntityResolution.reverdicts(m, cat, d1).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(rv1 === Seq((10L, 2L)))
    // delete the whole candidate neighbourhood: null match
    val d2 = Seq((1L, null: String, true), (2L, null: String, true))
      .toDF("ent_id", "ent_name", "deleted")
    val rv2 = EntityResolution.reverdicts(m, cat, d2).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq
    assert(rv2 === Seq((10L, None)))
  }

  test("the surfaced delta queries stamp an exact affected_ppm") {
    import spark.implicits._
    val nTot = EntityResolution.mentions(spark, dir).count()
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.select("affected_ppm").distinct().collect()
      assert(rows.length === 1, "affected_ppm must be constant across rows")
      assert(rows.head.getLong(0) === df.count() * 1000000L / nTot)
    }
    check(EntityResolution.matchCatalogDelta(spark, dir))
    val tomb = EntityResolution.matchCatalogTombstone(spark, dir)
    check(tomb)
    // the tombstone delta affects strictly fewer than everything on
    // this fixture — the gauge is non-vacuous
    assert(tomb.select("affected_ppm").head.getLong(0) < 1000000L)
  }
}
