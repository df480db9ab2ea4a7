package graft

/** PLAN-SHAPE scale invariance: the shuffle-exchange count of every
  * scale-study query must be IDENTICAL on an [[Amplify]]-amplified
  * fixture — growing the data may never grow the plan. This is the
  * machine-checked half of the scaling-exponent study ([[ScaleBench]]
  * measures the time ratios; this spec pins that the plan the time is
  * spent in did not change shape). A broadcast join that silently
  * flips to a shuffle at larger estimated sizes, or a layout consumer
  * that re-derives instead of scanning, fails here by name with both
  * plans attached.
  */
class ScaleInvarianceSpec extends SparkSpec {
  private val base = "/root/testdata/sf0.001"
  private lazy val amplified: String = {
    val out = java.nio.file.Files
      .createTempDirectory("graft-scale-inv").toString
    Amplify.amplify(spark, base, out, copies = 3)
    out
  }

  private def shuffles(name: String, dir: String): (Int, String) = {
    val plan = SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString
    val all = "Exchange".r.findAllIn(plan).length
    val bcast = "BroadcastExchange".r.findAllIn(plan).length
    (all - bcast, plan)
  }

  ScaleBench.StudyQueries.foreach { name =>
    test(s"$name: shuffle count is data-size invariant") {
      val (nSmall, pSmall) = shuffles(name, base)
      val (nBig, pBig) = shuffles(name, amplified)
      assert(nSmall === nBig,
        s"$name plan changed shape at 3x data ($nSmall -> $nBig shuffles)\n" +
          s"--- base plan ---\n$pSmall\n--- amplified plan ---\n$pBig")
    }
  }

  test("every registered query's shuffle count is data-size invariant") {
    // the full-surface form of the per-query tests above: build all 215
    // registered queries against base AND amplified fixtures and diff
    // the non-broadcast exchange counts. Plan-shape only (no result
    // jobs; construction-time training/layout jobs run at sf0.001
    // scale), so the whole surface costs seconds — and any query
    // whose plan grows with its data fails here by name.
    val drifted = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val (nSmall, _) = shuffles(name, base)
      val (nBig, _) = shuffles(name, amplified)
      if (nSmall == nBig) None else Some(s"$name: $nSmall -> $nBig")
    }
    assert(drifted.isEmpty,
      s"plans changed shape at 3x data:\n  ${drifted.mkString("\n  ")}")
  }

  test("amplified fixture preserves planted mod-class densities") {
    import spark.implicits._
    // the amplifier's core invariant: every planted population keyed
    // on a doc_id mod class appears at the same DENSITY in every copy
    val d = graft.engine.Tables.load(spark, amplified, "documents")
    val n = d.count()
    assert(n === 3 * graft.engine.Tables.load(spark, base, "documents").count())
    Seq(15 -> 7, 20 -> 3, 25 -> 0).foreach { case (m, r) =>
      val inBase = graft.engine.Tables.load(spark, base, "documents")
        .filter($"doc_id" % m === r).count()
      val inAmp = d.filter($"doc_id" % m === r).count()
      assert(inAmp === 3 * inBase, s"mod ($m, $r) density drifted")
    }
    // cross-copy isolation: token suffixing means no shingle travels
    // between copies — exact-dup groups never span copies
    val fpCopies = d
      .select((($"doc_id" / Amplify.DocShift).cast("long")).as("copy"),
        org.apache.spark.sql.functions.md5($"text").as("fp"))
      .groupBy($"fp")
      .agg(org.apache.spark.sql.functions.countDistinct($"copy").as("nc"))
      .filter($"nc" > 1).count()
    assert(fpCopies === 0L, "text fingerprints must not collide across copies")
  }

  test("amplified embeddings: signed rotation preserves intra-copy geometry exactly") {
    import spark.implicits._
    val e = graft.engine.Tables.load(spark, amplified, "embeddings")
    // copy-1 vectors are signed rotations (sign flips square away in
    // the norm; the shift reorders the sum): same norm, same pairwise
    // dot products as copy 0 — check norms match base to float-sum
    // tolerance
    val nrm = org.apache.spark.sql.functions.expr(
      "aggregate(embedding, CAST(0 AS DOUBLE), (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    val baseNorms = e.filter($"vec_id" < Amplify.VecShift)
      .select($"vec_id", nrm.as("n2")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val copy1 = e.filter($"vec_id" >= Amplify.VecShift && $"vec_id" < 2 * Amplify.VecShift)
      .select($"vec_id", nrm.as("n2")).collect()
    assert(copy1.nonEmpty)
    copy1.foreach { r =>
      val b = baseNorms(r.getLong(0) - Amplify.VecShift)
      // the rotated sum adds the same floats in a different order, so
      // compare to float-sum tolerance rather than bit-exactly
      assert(math.abs(r.getDouble(1) - b) <= 1e-6 * (1.0 + math.abs(b)),
        s"rotation changed the norm of ${r.getLong(0)}")
    }
  }

  test("amplified embeddings: no vector near-dups its own image") {
    import spark.implicits._
    // the artifact the signed rotation exists to kill (measured r11):
    // a bare k-step cyclic shift leaves every vector's lag-k
    // autocorrelation intact, so vectors paired with their OWN images
    // in other copies — 90% of the 10x near-dup graph was these
    // self-image chains, components spanned all ten copies, and the
    // min-label loop ran to depths no real dup graph reaches. With
    // hash-parity sign flips the self-image cosine is a random signed
    // sum: ZERO self-image pairs may survive the threshold. (Chance
    // cross-copy pairs between DIFFERENT base vectors remain and are
    // fine — dim-64 at threshold 0.35 is 2.8 sigma, and a real 10x
    // crawl also brings new near-dup pairs; what it never brings is
    // every vector duplicated into the next shard.)
    val amp = graft.operators.Dedup.embeddingCosine(spark, amplified)
      .withColumn("copy_a", org.apache.spark.sql.functions.expr(
        s"vec_a div ${Amplify.VecShift}"))
      .withColumn("copy_b", org.apache.spark.sql.functions.expr(
        s"vec_b div ${Amplify.VecShift}"))
    val selfImage = amp.filter($"copy_a" =!= $"copy_b")
      .filter($"vec_a" % Amplify.VecShift === $"vec_b" % Amplify.VecShift)
      .count()
    assert(selfImage === 0L,
      s"$selfImage vectors near-dup their own images across copies — " +
        "the amplifier transform is not decorrelating")
    // intra-copy edge mass mirrors the base exactly (the isometry),
    // up to 6-dp rounding of reordered float dots at the threshold
    val baseEdges = graft.operators.Dedup.embeddingCosine(spark, base).count()
    val intra = amp.filter($"copy_a" === $"copy_b").count()
    assert(math.abs(intra - 3L * baseEdges) <= 2L,
      s"intra-copy edge mass drifted: $intra vs 3x$baseEdges")
  }
}
