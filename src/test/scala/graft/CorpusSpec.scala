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

  test("weighted sample equals a Scala recompute and upsamples heavier docs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id",
        least(size(split($"text", " ")).cast("long"), lit(Corpus.WeightCap)).as("w"),
        expr("CAST(conv(substr(md5(text), 1, 4), 16, 10) AS BIGINT)").as("hb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = base.filter { case (_, w, hb) =>
      hb * Corpus.WeightCap * Corpus.WeightRateDen < 65536L * w * Corpus.WeightRateNum
    }.map(d => d._1 -> d._2).toMap
    assert(expect.nonEmpty, "weighted sample kept nothing — fixture weights too low")
    val got = Corpus.weightedSample(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    // keep-rate monotonicity in aggregate: the kept set's mean weight
    // exceeds the corpus mean (that is the point of importance sampling)
    val meanAll = base.map(_._2).sum.toDouble / base.length
    val meanKept = got.values.sum.toDouble / got.size
    assert(meanKept > meanAll, s"kept mean $meanKept <= corpus mean $meanAll")
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

  test("BPE-proxy packing counts ceil(bytes/4) and repacks differently from whitespace") {
    import spark.implicits._
    val texts = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bpe = Corpus.packBatches(spark, dir, tokens = Corpus.bpeProxyTokens)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    bpe.foreach { case (id, _, n, _) =>
      val bytes = texts(id).getBytes("UTF-8").length
      assert(n == (bytes + 3) / 4, s"doc $id bpe-proxy count")
    }
    // same contiguous-prefix law, new denomination: batch = exclusive
    // prefix of BPE counts div budget, per language in doc_id order
    bpe.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (_, _, n, batch) =>
        assert(batch == cum / Corpus.PackBudget)
        cum += n
      }
    }
    // and the two denominations genuinely differ (≈word-length/4 ratio)
    val ws = Corpus.packBatches(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bpe.exists { case (id, _, _, b) => ws(id) != b },
      "BPE-proxy budgets never re-binned a single doc — counter not plugged in?")
  }

  test("two-pass packBatchesOf equals the single-window prefix sum on a seeded frame") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val langs = Seq("en", "de", "es", "fr")
    val rows = (1L to 4000L).map(i => (i * 7 % 9973, langs(rnd.nextInt(4)), 1L + rnd.nextInt(300)))
      .distinctBy(_._1)
    val df = rows.toDF("doc_id", "lang", "n_tokens")
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = df.withColumn("batch",
      expr(s"coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) div ${Corpus.PackBudget}L"))
      .select($"doc_id", $"batch").as[(Long, Long)].collect().toMap
    Seq(1, 4, 32, 200).foreach { buckets =>
      val got = Corpus.packBatchesOf(df, Corpus.PackBudget, buckets)
        .select($"doc_id", $"batch").as[(Long, Long)].collect().toMap
      assert(got === naive, s"buckets=$buckets diverged from single-window prefix sum")
    }
  }

  test("packBatches plan: no window consumes raw document rows partitioned only by lang") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = Corpus.packBatches(spark, dir).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, "unpartitioned window in packBatches plan")
      if (w.partitionSpec.size == 1) {
        // a single-key (lang-only) window is allowed only over the
        // metadata-sized per-(lang, bucket) aggregate, never raw docs
        val overAggregate = w.child.collectFirst { case a: Aggregate => a }.isDefined
        assert(overAggregate,
          s"lang-only window over non-aggregated input: ${w.windowExpressions.mkString(", ")}")
      }
    }
    assert(windows.exists(_.partitionSpec.size >= 2),
      "expected the bucket-local prefix window partitioned by (lang, bucket)")
  }

  test("snapshotDiff classifies by doc_id arithmetic and is empty on identical snapshots") {
    val ids = graft.engine.Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Corpus.snapshotDiffHalves(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach { id =>
      val expected =
        if (id % 11 == 0 && id % 13 != 0) Some("added")
        else if (id % 13 == 0 && id % 11 != 0) Some("removed")
        else if (id % 7 == 0 && id % 11 != 0 && id % 13 != 0) Some("changed")
        else None
      assert(got.get(id) == expected, s"doc $id")
    }
    // unchanged docs never leak into the diff
    assert(got.keySet.subsetOf(ids))
    // identity diff is empty
    val d = graft.engine.Tables.load(spark, dir, "documents").select("doc_id", "text")
    assert(Corpus.snapshotDiff(d, d).count() === 0L)
  }

  test("manifest digest equals a BigInt recompute and is order-independent by construction") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = graft.engine.Tables.load(spark, dir, "documents")
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = rows.groupBy(t => (t._1, t._2)).map { case (cell, ts) =>
      cell -> (
        ts.length.toLong,
        ts.map(_._3.split(" ", -1).length.toLong).sum,
        ts.map(t => BigInt(md5hex(t._3).substring(0, 15), 16)).sum)
    }
    val got = Corpus.manifest(spark, dir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, tok, dig) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === tok)
      // the contract column is the exact sum reduced mod 2^61 into BIGINT
      assert(BigInt(r.getLong(4)) === dig.mod(BigInt("2305843009213693952")),
        s"digest_61 for (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("groupSample keeps the k hash-smallest docs per cell via WindowGroupLimit") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val k = Corpus.GroupSampleK
    val rows = graft.engine.Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val expected = rows.groupBy(t => (t._2, t._3)).toSeq.flatMap { case (cell, ts) =>
      ts.toSeq.sortBy(t => (md5hex(t._4), t._1)).take(k).zipWithIndex
        .map { case (t, i) => (t._1, cell._1, cell._2, i + 1L) }
    }.toSet
    val sampled = Corpus.groupSample(spark, dir)
    assert(sampled.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet === expected)
    // the rank filter must compile to WindowGroupLimit (map-side k-heap
    // pre-prune), or the bounded-domain cell key sorts whole cells
    assert(sampled.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "expected the rn <= k filter to push a WindowGroupLimit below the window")
  }

  test("bestOfCell keeps the k highest classifier scores per cell") {
    val scores = graft.operators.TextAnalysis.classifyDocs(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cells = graft.engine.Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = cells.groupBy(t => (t._2, t._3)).toSeq.flatMap { case (cell, ds) =>
      ds.toSeq.sortBy(d => (-scores(d._1), d._1)).take(Corpus.GroupSampleK).zipWithIndex
        .map { case (d, i) => (d._1, cell._1, cell._2, scores(d._1), i + 1L) }
    }.toSet
    val got = Corpus.bestOfCell(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
  }

  test("shuffle order is the exact (hash, doc_id) permutation with contiguous positions") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = graft.engine.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), java.lang.Long.parseLong(md5hex(r.getString(1)).substring(0, 4), 16)))
    val expected = docs.sortBy { case (id, hb) => (hb, id) }.map(_._1).toSeq
    val got = Corpus.shuffleOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.map(_._2).toSeq === (1L to docs.length).toSeq, "positions are contiguous from 1")
    assert(got.sortBy(_._2).map(_._1).toSeq === expected, "permutation matches (hash, id) order")
  }

  test("manifestDiff triages cells as added/removed/changed and drops identical cells") {
    import spark.implicits._
    val old = Seq(
      (1L, "s1", "en", "a b"), (2L, "s1", "fr", "c d"), (3L, "s2", "en", "e f"),
      (5L, "s9", "zh", "same words here"))
      .toDF("doc_id", "source", "lang", "text")
    val nw = Seq(
      (1L, "s1", "en", "a b"),                      // s1/en untouched
      (3L, "s2", "en", "e f CHANGED"),              // s2/en content moved
      (4L, "s3", "de", "brand new cell"),           // s3/de appears
      (5L, "s9", "zh", "same words here"))          // s9/zh untouched
      .toDF("doc_id", "source", "lang", "text")     // s1/fr vanished
    val got = Corpus.manifestDiff(old, nw).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getString(2))).toMap
    assert(got === Map(
      ("s1", "fr") -> "removed",
      ("s2", "en") -> "changed",
      ("s3", "de") -> "added"))
    assert(Corpus.manifestDiff(old, old).count() === 0L, "identity diff is empty")
  }

  test("topNSample returns exactly N hash-smallest docs, rerun-stable") {
    val got = Corpus.topNSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length === Corpus.TopNSampleN)
    assert(got.map(_._1).toSeq === (1L to Corpus.TopNSampleN.toLong), "positions contiguous")
    val sorted = got.sortBy(r => (r._3, r._2))
    assert(got.toSeq === sorted.toSeq, "ordered by (fingerprint, doc_id)")
    val again = Corpus.topNSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === again.toSeq, "rerun-stable")
  }

  test("dedupSavings accounts every doc and saves (copies-1)*tokens per fingerprint") {
    import spark.implicits._
    val rows = Corpus.dedupSavings(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val docs = graft.engine.Tables.load(spark, dir, "documents")
      .select($"source", $"text").collect().map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    assert(rows.map(_._1).sorted.toSeq === bySource.keys.toSeq.sorted)
    rows.foreach { case (src, (nDocs, nTokens, nDup, saved)) =>
      val texts = bySource(src).map(_._2)
      assert(nDocs === texts.length.toLong)
      assert(nTokens === texts.map(_.split(" ", -1).length.toLong).sum)
      val expSaved = texts.groupBy(identity).values
        .map(g => (g.length - 1).toLong * g.head.split(" ", -1).length).sum
      val expDup = texts.groupBy(identity).values.map(g => (g.length - 1).toLong).sum
      assert(nDup === expDup, s"dup docs for $src")
      assert(saved === expSaved, s"tokens saved for $src")
    }
  }

  test("lengthHisto bins by exact integer log2 and accounts every doc and token") {
    import spark.implicits._
    val toks = graft.engine.Tables.load(spark, dir, "documents")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val expect = toks.groupBy { case (src, n) =>
      (src, (1 to Corpus.LengthHistoMaxPow).count(i => (1L << i) <= n).toLong)
    }.view.mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val got = Corpus.lengthHisto(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expect)
    assert(got.map(_._2._1).sum === toks.length.toLong, "every doc binned once")
  }

  test("crossSourceDup counts distinct shared chunks per source pair, non-vacuously") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = graft.engine.Tables.load(spark, dir, "documents")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val roster = docs.flatMap { case (src, text) =>
      text.split(" ", -1).grouped(graft.operators.Dedup.ChunkWords)
        .map(g => (src, md5hex(g.mkString(" "))))
    }.distinct
    val byFp = roster.groupBy(_._2).values.toSeq
    val expect = byFp.flatMap { members =>
      val srcs = members.map(_._1).sorted.toSeq
      for { a <- srcs; b <- srcs if a < b } yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.Dedup.crossSourceDup(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    assert(got.nonEmpty, "fixture has cross-source chunk sharing")
  }

  test("padWaste matches a driver recompute and pads every short doc to one sequence") {
    import spark.implicits._
    val L = Corpus.PadSeqLen
    val toks = graft.engine.Tables.load(spark, dir, "documents")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val expect = toks.groupBy(_._1).view.mapValues { g =>
      val tok = g.map(_._2).sum
      val seqs = g.map { case (_, n) => (n + L - 1) / L }.sum
      (g.length.toLong, tok, seqs, seqs * L - tok,
        (BigInt(seqs * L - tok) * 1000000 / (seqs * L)).toLong)
    }.toMap
    val got = Corpus.padWaste(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expect)
    assert(got.values.forall(v => v._4 >= 0 && v._5 < 1000000L))
  }

  test("budgetTrim keeps each source's hash-order prefix under half its tokens") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, size, split}
    val d = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source",
        expr("CAST(conv(substr(md5(text), 1, 4), 16, 10) AS BIGINT)").as("hb"),
        size(split($"text", " ")).cast("long").as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // driver recompute: per source, walk (hb, doc_id) order accumulating
    val expect = d.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val total = rows.map(_._4).sum
      var cum = 0L
      rows.sortBy(r => (r._3, r._1)).toSeq.flatMap { case (id, _, _, n) =>
        val keep = 2 * cum < total
        val out = if (keep) Some(id -> ((cum, n))) else None
        cum += n
        out
      }
    }.toMap
    val got = Corpus.budgetTrim(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(2)))).toMap
    assert(got === expect)
    // the trim actually trims: strictly fewer docs than the corpus
    assert(got.size < d.length && got.nonEmpty)
  }

  test("curriculum is the exact (score, hash, doc_id) permutation with contiguous positions") {
    import spark.implicits._
    val scores = graft.operators.TextAnalysis.classifyDocs(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hbs = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id",
        org.apache.spark.sql.functions.expr(
          "CAST(conv(substr(md5(text), 1, 4), 16, 10) AS BIGINT)").as("hb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedOrder = scores.keys.toSeq
      .sortBy(id => (scores(id), hbs(id), id))
    val got = Corpus.curriculum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).toSeq === (1L to got.length.toLong), "positions contiguous from 1")
    assert(got.sortBy(_._3).map(_._1).toSeq === expectedOrder, "permutation matches sort key")
    got.foreach { case (id, score, _) => assert(score === scores(id)) }
  }

  test("chunkWindows covers every token with the configured stride and overlap") {
    import spark.implicits._
    val ta = graft.operators.TextAnalysis
    val texts = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val got = ta.chunkWindows(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    texts.foreach { case (id, text) =>
      val t = text.split(" ", -1)
      val nw = 1 + math.max(0,
        math.ceil((t.length - ta.WindowTokens).toDouble / ta.WindowStride)).toLong
      val wins = (0L until nw).map { i =>
        val s = (i * ta.WindowStride).toInt
        t.slice(s, s + ta.WindowTokens)
      }
      wins.zipWithIndex.foreach { case (w, i) =>
        val (n, fp) = got((id, i.toLong))
        assert(n === w.length.toLong, s"window $i of doc $id token count")
        assert(fp === md5hex(w.mkString(" ")), s"window $i of doc $id fingerprint")
      }
      assert(!got.contains((id, nw)), s"doc $id has exactly $nw windows")
      // coverage: consecutive windows overlap by W - S tokens (until the tail)
      assert(ta.WindowTokens > ta.WindowStride, "geometry guarantees overlap")
    }
  }

  test("epochs expansion applies whole + fractional factors per source, deterministically") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val recipe = Corpus.EpochRecipe.map { case (s, w, f) => s -> ((w, f)) }.toMap
    val docs = graft.engine.Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        java.lang.Long.parseLong(md5hex(r.getString(2)).substring(0, 4), 16)))
    val expected = docs.map { case (id, src, hb) =>
      val (w, f) = recipe.getOrElse(src, Corpus.EpochDefault)
      id -> (w + (if (hb < f) 1 else 0)).toLong
    }.filter(_._2 > 0).toMap
    def run() = Corpus.epochs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val got = run()
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(byDoc.keySet === expected.keySet)
    byDoc.foreach { case (id, copies) =>
      assert(copies === (1L to expected(id)), s"copies for doc $id")
    }
    // content-keyed, so a rerun expands identically
    assert(run() === got)
    // the recipe genuinely exercises whole epochs, fractions, and downsampling
    assert(docs.exists { case (id, src, _) => src == "src1" && expected(id) == 3L })
    assert(docs.exists { case (id, src, _) => src == "src2" && !expected.contains(id) })
  }

  test("shardWrite materializes disjoint contiguous shards whose manifests match the plan") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val written = Corpus.shardWrite(spark, dir, out).collect()
    val planned = Corpus.shardManifest(spark, dir).collect()
    assert(written.map(_.toString).toSeq === planned.map(_.toString).toSeq,
      "file-derived manifest equals the planned manifest")
    val dirs = new java.io.File(out).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.length === Corpus.ShardCount, "one path-addressable dir per shard")
    val ranges = planned.map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val total = planned.map(_.getLong(1)).sum
    assert(ranges.head._2 === 1L)
    assert(ranges.last._3 === total)
    ranges.sliding(2).foreach {
      case Array((_, _, aMax), (_, bMin, _)) => assert(bMin === aMax + 1, "gap-free")
      case _ =>
    }
    planned.foreach { r =>
      assert(r.getLong(1) === r.getLong(3) - r.getLong(2) + 1,
        s"shard ${r.getLong(0)} holds its whole contiguous range")
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

  test("bucketBatches matches a driver recompute and beats fixed-length padding") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = graft.engine.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val hb = java.lang.Long.parseLong(md5hex(r.getString(1)).substring(0, 4), 16)
        val nTok = r.getString(1).split(" ", -1).length.toLong
        val bin = (1 to Corpus.LengthHistoMaxPow).count(i => (1L << i) <= nTok).toLong
        (r.getLong(0), hb, nTok, bin)
      }
    val expected = rows.groupBy(_._4).map { case (bin, ds) =>
      val batches = ds.sortBy(d => (d._2, d._1))
        .grouped(Corpus.BucketBatchSize).toSeq
      val tokens = ds.map(_._3).sum
      val padded = batches.map(b => b.map(_._3).max * b.length).sum
      bin -> (ds.length.toLong, batches.length.toLong, tokens, padded,
        BigInt(1000000) * (padded - tokens) / padded)
    }
    val got = Corpus.bucketBatches(spark, dir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, nb, tok, pad, ppm) = expected(r.getLong(0))
      assert(r.getLong(1) === n, s"n_docs bin ${r.getLong(0)}")
      assert(r.getLong(2) === nb, s"n_batches bin ${r.getLong(0)}")
      assert(r.getLong(3) === tok, s"n_tokens bin ${r.getLong(0)}")
      assert(r.getLong(4) === pad, s"n_padded bin ${r.getLong(0)}")
      assert(r.getLong(5) === ppm.toLong, s"pad_ppm bin ${r.getLong(0)}")
    }
    // the scheme's whole point: bucketed pad waste is far below the
    // fixed-length baseline where every doc pays max corpus length
    val globalMax = rows.map(_._3).max
    val allTok = rows.map(_._3).sum
    val fixedPpm = BigInt(1000000) * (globalMax * rows.length - allTok) /
      (globalMax * rows.length)
    val worstBin = got.map(_.getLong(5)).max
    assert(worstBin < fixedPpm.toLong,
      s"bucketed pad $worstBin ppm must beat fixed-length $fixedPpm ppm")
  }

  test("dsir matches a driver recompute of the integer importance arithmetic") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def ilog2(x: Long): Long = if (x <= 0) -1L else 63 - java.lang.Long.numberOfLeadingZeros(x)
    val rows = graft.engine.Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val toks = rows.flatMap { case (id, src, lang, text) =>
      text.split(" ", -1).filter(_.nonEmpty)
        .map(w => (id, src, lang, java.lang.Long.parseLong(md5hex(w).substring(0, 2), 16)))
    }
    val cr = toks.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val ct = toks.filter(_._3 == Corpus.DsirTargetLang)
      .groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val nr = cr.values.map(_ + 1).sum
    // .toSeq first: Set.map would dedupe equal (ct+1) values pre-sum
    val nt = cr.keys.toSeq.map(b => ct.getOrElse(b, 0L) + 1).sum
    val weight = cr.keys.map { b =>
      val ratio = (BigInt(1000000) * (ct.getOrElse(b, 0L) + 1) * nr /
        (BigInt(cr(b) + 1) * nt)).toLong
      b -> (ilog2(ratio) - Corpus.DsirScaleLog)
    }.toMap
    val perDoc = toks.groupBy(t => (t._1, t._2, t._3)).view
      .mapValues(_.map(t => weight(t._4)).sum).toMap
    val expected = perDoc.groupBy { case ((_, src, lang), _) => (src, lang) }
      .map { case (cell, docs) =>
        cell -> (docs.size.toLong, docs.values.count(_ > 0).toLong, docs.values.sum)
      }
    val got = Corpus.dsir(spark, dir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, keep, sum) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === n, s"n_docs ${r.getString(0)}/${r.getString(1)}")
      assert(r.getLong(3) === keep, s"n_keep ${r.getString(0)}/${r.getString(1)}")
      assert(r.getLong(4) === sum, s"score_sum ${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("dsirApply returns exactly the positive-score docs of the report") {
    val rep = Corpus.dsir(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val got = Corpus.dsirApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.forall(_._4 > 0L), "apply keeps only positive scores")
    val byCell = got.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong).toMap
    rep.foreach { case (cell, nKeep) =>
      assert(byCell.getOrElse(cell, 0L) === nKeep, s"cell $cell keep count")
    }
    assert(got.map(_._1).distinct.length === got.length, "one row per doc")
  }

  test("dsir separates a planted target vocabulary from background") {
    import spark.implicits._
    // target-lang docs draw from a disjoint vocabulary: every target
    // bucket is target-heavy, every background bucket target-empty, so
    // the importance scores must split the two populations cleanly
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, s"tgtword${i % 5} tgtword${(i + 1) % 5} tgtword${(i + 2) % 5}",
        Corpus.DsirTargetLang, "s0", 3L)
      else (i.toLong, s"bgword${i % 5} bgword${(i + 1) % 5} bgword${(i + 2) % 5}",
        "zz", "s0", 3L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("dsir").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Corpus.dsir(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nEn, keepEn, sumEn) = got(("s0", Corpus.DsirTargetLang))
    val (nZz, keepZz, sumZz) = got(("s0", "zz"))
    assert(nEn === 20L && nZz === 20L)
    assert(keepEn === 20L, "every target-vocab doc scores positive")
    assert(keepZz === 0L, "no background-vocab doc scores positive")
    assert(sumEn > 0L && sumZz < 0L)
  }

  test("temperature weights are exact integer sqrts and tau=0.5 flattens the mix") {
    val rows = Corpus.temperature(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.length >= 2, "need at least two sources to mix")
    rows.foreach { case (s, nDocs, nTok, w, _, _, rate, kept) =>
      assert(w * w <= nTok && nTok < (w + 1) * (w + 1),
        s"$s: weight $w is not isqrt($nTok)")
      assert(rate >= 0L && rate <= 1000000L)
      assert(kept >= 0L && kept <= nDocs)
    }
    // sqrt is concave: the token-richest source's share shrinks, the
    // poorest source's share grows (±1 ppm truncation slack)
    val byTok = rows.sortBy(_._3)
    assert(byTok.last._6 <= byTok.last._5 + 1,
      "largest source must not gain share under tau=0.5")
    assert(byTok.head._6 + 1 >= byTok.head._5,
      "smallest source must not lose share under tau=0.5")
    // the hash threshold actually sampled something somewhere
    assert(rows.map(_._8).sum > 0L)
  }
}
