package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions.{explode, size, split}

import graft.operators.Dedup

/** Driver-side naive recompute of chunk-level dedup over the real
  * sf0.001 corpus — an engine-independent second implementation (plain
  * Scala, no Spark expressions) so a shared bug in the Spark and
  * DuckDB HOF pipelines cannot hide.
  */
class DedupDifferentialSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("minhash-LSH layout read is row-identical to a fresh derivation") {
    // the derive-once pair layout (Graph span-layout precedent) must
    // serve exactly the rows the derivation produces
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val dir = "/root/testdata/sf0.001"
    assert(rows(graft.operators.Dedup.minhashLsh(spark, dir))
      === rows(graft.operators.Dedup.minhashLshDerive(spark, dir)
        .orderBy("doc_a", "doc_b")))
  }

  test("cluster-label layouts are row-identical to live loop runs, then scan-only") {
    // the derive-once label layouts (Graph.componentLabelsLayout
    // precedent): reports roll up labels without re-iterating the CC
    // loop — the layout must serve exactly the live loop's rows, and
    // a second lookup must reuse the materialized files
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val a = Dedup.clusterLabelsLayout(spark, dir)
    assert(rows(a) === rows(Dedup.clusters(spark, dir)))
    assert(a.inputFiles.toSet ===
      Dedup.clusterLabelsLayout(spark, dir).inputFiles.toSet,
      "second lookup re-iterated the cluster loop")
    val e = Dedup.embeddingClusterLabelsLayout(spark, dir)
    assert(rows(e) === rows(Dedup.embeddingClusters(spark, dir)))
    val plan = Dedup.clusterSizes(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"not a scan:\n$plan")
    assert(!plan.contains("LogicalRDD") && !plan.contains("ExistingRDD"),
      s"cluster-size rollup re-ran the loop instead of scanning the layout:\n$plan")
  }

  test("shingle-pair layouts are row-identical to fresh derivations") {
    // the third derive-once layout family (r11): base pair core and
    // its excerpt-augmented twin must serve exactly the rows their
    // derivations produce
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val base = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    assert(rows(Dedup.shinglePairLayout(spark, dir))
      === rows(Dedup.shinglePairCounts(base)))
    assert(rows(Dedup.shinglePairLayoutExcerpts(spark, dir))
      === rows(Dedup.shinglePairCounts(Dedup.excerptFrame(spark, dir))))
    // the two relations genuinely differ (excerpt pairs exist), which
    // is why containment cannot be served by filtering the base layout
    assert(rows(Dedup.shinglePairLayoutExcerpts(spark, dir)).size
      > rows(Dedup.shinglePairLayout(spark, dir)).size)
  }

  test("shingle-key kernel matches the HOF twin on corpus and short-token edges") {
    import spark.implicits._
    val docs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val (shHof, sizesHof) = Dedup.shingleKeysHof(docs)
    def keyBag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted.toList
    val shKernel = docs.select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id",
        explode(graft.plans.ArrayExpressions.shingleKeys($"t")).as("sk"))
    assert(keyBag(shKernel) === keyBag(shHof), "posting multisets must be identical")
    val sizesKernel = docs.select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id",
        size(graft.plans.ArrayExpressions.shingleKeys($"t")).cast("long").as("n"))
    assert(keyBag(sizesKernel) === keyBag(sizesHof), "distinct counts must be identical")
    // edge: exactly 3 tokens = one shingle; repeated trigrams dedupe
    val edge = Seq((1L, "a b c"), (2L, "a b c a b c a b c")).toDF("doc_id", "text")
    val got = edge.select($"doc_id",
        graft.plans.ArrayExpressions.shingleKeys(split($"text", " ")).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(got(1L).size === 1)
    // doc 2's 7 positional trigrams collapse to the 3 distinct rotations
    assert(got(2L).size === 3 && got(2L).contains(got(1L).head))
  }

  test("string-shingle kernel equals the HOF shingle array element for element") {
    import spark.implicits._
    val docs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").limit(200)
    val toks = docs.select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
    val hof = toks.select($"doc_id", org.apache.spark.sql.functions.expr(
        """array_distinct(transform(sequence(0, size(t)-3),
          |  i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))""".stripMargin).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val kern = toks.select($"doc_id",
        graft.plans.ArrayExpressions.shingles($"t").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(kern === hof, "same strings in the same first-occurrence order")
  }

  test("chunkDedupApply keeps exactly one occurrence per fingerprint and rebuilds intact docs") {
    import spark.implicits._
    val texts = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val w = Dedup.ChunkWords
    val distinctFps = texts.values
      .flatMap(_.split(" ", -1).toSeq.grouped(w).map(g => md5hex(g.mkString(" "))))
      .toSet
    val rows = Dedup.chunkDedupApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    rows.foreach { case (_, nChunks, nKept, _) => assert(nKept <= nChunks) }
    // every distinct chunk fingerprint has exactly one keeper corpus-wide
    assert(rows.map(_._3).sum === distinctFps.size.toLong)
    // a doc that kept all its chunks rebuilds to its original text
    val intact = rows.filter(r => r._2 === r._3)
    assert(intact.nonEmpty)
    intact.foreach { case (id, _, _, cleanMd5) =>
      assert(cleanMd5 === md5hex(texts(id)), s"doc $id rebuilt differently")
    }
    // and at least one doc lost a chunk (the corpus has cross-doc dups)
    assert(rows.exists(r => r._3 < r._2))
  }

  test("boilerplateStrip equals a plain-Scala recompute and drops EVERY common chunk") {
    import spark.implicits._
    val texts = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val w = Dedup.ChunkWords
    def chunksOf(t: String): Seq[String] =
      t.split(" ", -1).toSeq.grouped(w).map(_.mkString(" ")).toSeq
    val df = texts.toSeq
      .flatMap { case (id, t) => chunksOf(t).map(c => (md5hex(c), id)) }
      .distinct.groupBy(_._1).view.mapValues(_.size).toMap
    val common = df.collect { case (fp, n) if n >= Dedup.BoilerplateDf => fp }.toSet
    assert(common.nonEmpty, "fixture should contain cross-doc boilerplate")
    val rows = Dedup.boilerplateStrip(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length === texts.size)
    rows.foreach { case (id, nChunks, nKept, cleanMd5) =>
      val cs = chunksOf(texts(id))
      val kept = cs.filterNot(c => common.contains(md5hex(c)))
      assert(nChunks === cs.length.toLong, s"doc $id chunk count")
      assert(nKept === kept.length.toLong, s"doc $id kept count")
      assert(cleanMd5 === md5hex(kept.mkString(" ")), s"doc $id rebuild")
    }
    // unlike chunkDedupApply, no occurrence of a common chunk survives anywhere
    assert(rows.map(_._3).sum ===
      texts.toSeq.flatMap(t => chunksOf(t._2)).count(c => !common.contains(md5hex(c))).toLong)
  }

  test("chunkDedup equals a plain-Scala recompute on the corpus") {
    import spark.implicits._
    val texts = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // naive: exact same contract, different machinery
    val w = Dedup.ChunkWords
    val chunks: Map[Long, Seq[String]] = texts.map { case (id, text) =>
      id -> text.split(" ", -1).toSeq.grouped(w).map(g => md5hex(g.mkString(" "))).toSeq
    }
    val docsPerFp = chunks.toSeq
      .flatMap { case (id, fps) => fps.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.map(_._2).distinct.size }
    val dupFps = docsPerFp.filter(_._2 > 1).keySet
    val expect = chunks.map { case (id, fps) =>
      id -> (fps.size.toLong, fps.count(dupFps).toLong)
    }

    val got = Dedup.chunkDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expect.keySet)
    val diffs = expect.collect { case (id, e) if got(id) != e => (id, e, got(id)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
    // the corpus must actually exercise the duplicated path
    assert(got.values.map(_._2).sum > 0, "no duplicated chunks found at all")
  }

  test("incremental dedup: empty store = exact election; grown store = idempotent") {
    import spark.implicits._
    val d = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val emptyStore = Seq.empty[String].toDF("fingerprint")
    // against an empty store, incremental IS the batch's exact keeper
    // election (one keeper per fingerprint, min doc_id)
    val first = Dedup.incremental(emptyStore, d)
    val expect: Map[String, Long] = d.select($"doc_id", $"text").collect()
      .map(r => md5hex(r.getString(1)) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val got = first.collect().map(r => r.getString(1) -> (r.getLong(0), r.getLong(2))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (fp, (id, _)) => assert(id == expect(fp), s"keeper for $fp") }
    // merge survivors into the store; re-ingesting the SAME batch must
    // yield nothing (the idempotence a daily pipeline relies on)
    val grown = emptyStore.unionAll(first.select($"fingerprint"))
    assert(Dedup.incremental(grown, d).isEmpty, "re-ingested batch must add nothing")
    // and a half-grown store drops exactly the covered fingerprints
    val half = first.filter($"doc_id" % 2 === 0).select($"fingerprint")
    val survivors = Dedup.incremental(half, d).select($"fingerprint").collect()
      .map(_.getString(0)).toSet
    assert(survivors == expect.keySet.diff(
      got.filter(_._2._1 % 2 == 0).keySet))
  }

  test("incrementalNearDup flags exactly the docs sharing a band with history") {
    import spark.implicits._
    val d = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val existing = d.filter($"doc_id" % 2 === 0)
    val incoming = d.filter($"doc_id" % 2 === 1)
    val flagged = Dedup.incrementalNearDupHalves(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    flagged.foreach { case (id, hits) =>
      assert(id % 2 == 1, "only incoming docs are flagged")
      assert(hits >= 1 && hits <= 4, s"doc $id band hits out of range: $hits")
    }
    // a doc ingested against a store containing ITSELF always flags
    // with all 4 bands (self-collision — the sanity anchor)
    val self = Dedup.incrementalNearDup(incoming, incoming).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incomingIds = incoming.select($"doc_id").collect().map(_.getLong(0))
      .filter(id => self.contains(id))
    assert(incomingIds.nonEmpty)
    assert(incomingIds.forall(id => self(id) == 4L), "self-probe hits all 4 bands")
  }

  test("cascade attributes every doc to its first dropping stage with coherent keepers") {
    import graft.operators.Dedup
    val rows = Dedup.cascade(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byId = rows.map(t => t._1 -> t).toMap
    val baseIds = graft.engine.Tables.load(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every planted exact copy drops at 'exact' back to its original
    baseIds.filter(_ % 20 == 3).foreach { id =>
      val (_, st, k) = byId(id + Dedup.CascadeExactShift)
      assert(st === "exact" && k === id, s"copy of $id")
      assert(byId(id)._2 !== "exact", s"original $id must not drop at exact")
    }
    // every planted case-noise doc drops at 'normalized' back to its original
    baseIds.filter(_ % 20 == 5).foreach { id =>
      val (_, st, k) = byId(id + Dedup.CascadeCaseShift)
      assert(st === "normalized" && k === id, s"case copy of $id")
    }
    // near attributions equal the cluster relation on the base corpus
    val clusters = Dedup.clusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, st, k) =>
      if (st == "near") assert(clusters(id) === k && k < id)
      if (st == "kept") assert(k === id)
      assert(k <= id, "keepers are min-id: never newer than the doc")
    }
    // the cascade covers base + both planted populations exactly once
    assert(rows.length === baseIds.size
      + baseIds.count(_ % 20 == 3) + baseIds.count(_ % 20 == 5))
    assert(rows.exists(_._2 == "near"), "corpus minhash near-dups must surface")
    assert(rows.count(_._2 == "kept") > 0)
  }

  test("cascadeStats partitions the cascade corpus mass exactly") {
    import graft.operators.Dedup
    val rows = Dedup.cascade(spark, dir).collect().map(r => (r.getLong(0), r.getString(1)))
    val stats = Dedup.cascadeStats(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats.keySet.subsetOf(Set("exact", "normalized", "near", "kept")))
    val byStage = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    byStage.foreach { case (st, n) => assert(stats(st)._1 === n, s"stage $st doc count") }
    assert(stats.values.map(_._1).sum === rows.length.toLong, "stage masses sum to corpus")
    assert(stats.values.forall(_._2 > 0L), "token mass present per stage")
    // (the live-vs-stats agreement above is the cascadeLayout equality
    // pin); the rollup itself must scan the layout, not re-elect
    val plan = Dedup.cascadeStats(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"not a scan:\n$plan")
    assert(!plan.contains("md5"), s"stats rollup re-ran the fingerprint elections:\n$plan")
  }

  test("bloom prefilter: zero false negatives vs ground truth; driver recompute matches") {
    import spark.implicits._
    val d = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val storeTexts = d.filter($"doc_id" % 2 === 0).select($"text").collect()
      .map(_.getString(0))
    val storeFps = storeTexts.map(md5hex).toSet
    // driver-side second implementation of the bit array
    def positions(fp: String): Seq[Long] =
      (0 until Dedup.BloomHashes).map(j =>
        java.lang.Long.parseLong(fp.substring(5 * j, 5 * j + 5), 16))
    val expectWords = new Array[Long](Dedup.BloomBits / Dedup.BloomWordBits)
    storeFps.foreach(fp => positions(fp).foreach { p =>
      expectWords((p / Dedup.BloomWordBits).toInt) |= (1L << (p % Dedup.BloomWordBits).toInt)
    })
    val words = Dedup.bloomWords(
      d.filter($"doc_id" % 2 === 0)
        .select(org.apache.spark.sql.functions.md5($"text").as("fingerprint")))
    assert(words.toSeq == expectWords.toSeq, "built bit array matches driver recompute")
    // probe the surfaced batch; cross-check each row against ground truth
    val batchTexts = d.filter($"doc_id" % 2 === 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)) ++
      d.filter($"doc_id" % 10 === 0).collect()
        .map(r => (r.getLong(0) + Dedup.RecrawlShift) -> r.getString(1))
    val got = Dedup.bloomHalves(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.keySet == batchTexts.map(_._1).toSet)
    var truePos = 0
    batchTexts.foreach { case (id, text) =>
      val (hits, maybe) = got(id)
      val inStore = storeFps.contains(md5hex(text))
      assert(maybe == (hits == Dedup.BloomHashes.toLong))
      if (inStore) { truePos += 1
        assert(maybe, s"FALSE NEGATIVE: doc $id is in the store but bloom missed it")
      }
      // driver recompute of the probe itself
      val expHits = positions(md5hex(text)).count(p =>
        (expectWords((p / Dedup.BloomWordBits).toInt)
          & (1L << (p % Dedup.BloomWordBits).toInt)) != 0L)
      assert(hits == expHits.toLong, s"probe count for doc $id")
    }
    assert(truePos > 0, "recrawl salt guarantees true duplicates exist")
  }
}
