package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.EventStreams

/** The document TAKEDOWN face of the cascade serving stores (the
  * corpus-side delete face, round 15): a taken-down doc must leave
  * every serving surface — its own verdicts, the keeper elections it
  * won, the buckets it occupies, and the component structure it held
  * together. Contracts pinned here: store ≡ a batch recompute over the
  * SURVIVING corpus after every takedown (including a component-
  * splitting bridge removal and a keeper revocation), takedown replay
  * idempotence + the monotonic tombId guard, ingest-replay safety
  * after a takedown, the erasure audit lifecycle through compaction,
  * and the cap-uncross detector.
  *
  * The near-dup fixture is md5-deterministic (probed once, frozen):
  * word pools `left49*`/`right49*` give the bridge doc a shared LSH
  * band with BOTH sides at est_jaccard 0.5/0.375 and est 0.0 across —
  * the spec runs the cascade at threshold 0.2 (the test seam
  * [[EventStreams.applyCascadeBatch]] exposes) so both bridge edges
  * hold and the cross pair never does.
  */
class TakedownSpec extends SparkSpec {

  private val Threshold = 0.2

  private def cycleText(words: Seq[String], reps: Int): String =
    Seq.fill(reps)(words).flatten.mkString(" ")

  private val w1 = (0 until 12).map(i => s"left49w$i")
  private val w2 = (0 until 12).map(i => s"right49w$i")

  // {10,11} sig-identical pair, 20 the bridge, {30,31} sig-identical
  // pair; {40,41,42} an exact-dup group; 50 a loner
  private def fixtureDocs: Seq[(Long, String)] = Seq(
    10L -> cycleText(w1, 3),
    11L -> cycleText(w1, 4),
    20L -> (cycleText(w1, 3) + " " + cycleText(w2, 3)),
    30L -> cycleText(w2, 3),
    31L -> cycleText(w2, 4),
    40L -> "wholly unrelated exact duplicate payload row",
    41L -> "wholly unrelated exact duplicate payload row",
    42L -> "wholly unrelated exact duplicate payload row",
    50L -> "a lone document about nothing in particular")

  private def verdicts(df: DataFrame): Seq[(Long, String, Long)] =
    df.select("doc_id", "stage", "keeper_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq

  /** Batch recompute over an arbitrary surviving corpus — the oracle
    * every takedown state must equal (the rebuild spec's twin, with
    * the spec threshold).
    */
  private def batchTwin(docs: DataFrame): Seq[(Long, String, Long)] = {
    import spark.implicits._
    val corpus = Dedup.fingerprintsOf(docs)
      .select($"doc_id", $"fp", $"nfp").localCheckpoint()
    val labels = Dedup.clustersOver(corpus.select($"doc_id"),
      Dedup.lshEdgesOverBands(
        Dedup.bandSigRows(Dedup.signaturesOf(docs)), threshold = Threshold),
      Dedup.ClusterMaxHops)
    verdicts(Dedup.cascadeOver(corpus,
      corpus.groupBy($"fp").agg(min($"doc_id").as("ek")),
      corpus.groupBy($"nfp").agg(min($"doc_id").as("nk")),
      labels))
  }

  test("takedown lifecycle: store ≡ batch over survivors across bridge removal, keeper revocation, replay, and the audit through compaction") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-takedown").toString
    EventStreams.cascadeStoreInit(spark, root)
    val all = fixtureDocs.toDF("doc_id", "text").localCheckpoint()
    def batch(ids: Long*): DataFrame =
      all.filter($"doc_id".isInCollection(ids))
    EventStreams.applyCascadeBatch(batch(10L, 11L, 20L, 40L, 41L, 50L),
      root, 0L, threshold = Threshold)
    EventStreams.applyCascadeBatch(batch(30L, 31L, 42L),
      root, 1L, threshold = Threshold)
    def served() = verdicts(EventStreams.readCascadeVerdicts(spark, root))

    // sanity: the bridge shape holds — one near component through 20
    val pre = served()
    assert(pre === batchTwin(all))
    assert(pre.find(_._1 == 31L).get === ((31L, "near", 10L)),
      s"the bridge must merge both pairs into cluster 10: $pre")

    // ---- takedown 1: the BRIDGE doc. The component must SPLIT: a
    // batch recompute over survivors has no 10-30 path ----
    val report0 = EventStreams.takedownCascadeDocs(spark, root, Seq(20L),
      tombId = 0L, threshold = Threshold)
    assert(report0.count() === 0, "no bucket is saturated in this fixture")
    val surv1 = all.filter($"doc_id" =!= 20L).localCheckpoint()
    val after1 = served()
    assert(after1 === batchTwin(surv1),
      "after the bridge takedown the store must equal a batch recompute over survivors")
    assert(after1.find(_._1 == 20L).isEmpty, "the doc itself is gone from serving")
    assert(after1.find(_._1 == 11L).get === ((11L, "near", 10L)))
    assert(after1.find(_._1 == 31L).get === ((31L, "near", 30L)),
      s"the split component must re-name to its surviving min: $after1")
    assert(after1.find(_._1 == 30L).get._2 === "kept")

    // ---- takedown 2: a KEEPER (40, the exact-group min — its
    // election must re-run) and a CLUSTER NAME (10, the {10,11}
    // component's label — the survivor must relabel to itself) ----
    EventStreams.takedownCascadeDocs(spark, root, Seq(40L, 10L),
      tombId = 1L, threshold = Threshold)
    val surv2 = all.filter(!$"doc_id".isInCollection(Seq(20L, 40L, 10L)))
      .localCheckpoint()
    val after2 = served()
    assert(after2 === batchTwin(surv2))
    assert(after2.find(_._1 == 42L).get === ((42L, "exact", 41L)),
      s"the exact election must re-elect the surviving min: $after2")
    assert(after2.find(_._1 == 41L).get._2 === "kept")
    assert(after2.find(_._1 == 11L).get === ((11L, "kept", 11L)),
      s"the orphaned near survivor must relabel to itself: $after2")

    // ---- replay contracts ----
    // a REUSED LOWER tombId is refused before any write
    val err = intercept[IllegalArgumentException] {
      EventStreams.takedownCascadeDocs(spark, root, Seq(50L), tombId = 0L,
        threshold = Threshold)
    }
    assert(err.getMessage.contains("monotonically increasing"))
    assert(served() === after2, "the refused takedown must not have landed")
    // exact replay of the last takedown is idempotent
    EventStreams.takedownCascadeDocs(spark, root, Seq(40L, 10L),
      tombId = 1L, threshold = Threshold)
    assert(served() === after2)
    // a restarted stream replaying its last ingest batch cannot move
    // serving: sub-store deltas overwrite identically, the label delta
    // re-contracts edges the repaired store already absorbed
    EventStreams.applyCascadeBatch(batch(30L, 31L, 42L),
      root, 1L, threshold = Threshold)
    assert(served() === after2)

    // ---- the erasure audit lifecycle ----
    val deleted = Seq(20L, 40L, 10L)
    def audit() = EventStreams.erasureAuditCascade(spark, root, deleted)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val auditPre = audit()
    assert(auditPre("docs") > 0 && auditPre("bands") > 0,
      s"raw doc rows persist until compaction: $auditPre")
    assert(auditPre("labels") === 0,
      s"the label swap erased the deleted docs' rows physically: $auditPre")
    assert(auditPre("tombstone_record") === 3L,
      s"the deletion ledger holds the request: $auditPre")
    // a post-takedown ingest unfences the pre-takedown deltas, then
    // compaction erases physically
    EventStreams.applyCascadeBatch(
      Seq((60L, "a fresh post takedown document arrival"))
        .toDF("doc_id", "text"), root, 2L, threshold = Threshold)
    assert(EventStreams.compactCascadeStores(spark, root, maxDeltas = 1))
    val auditPost = audit()
    assert(Seq("docs", "bands", "fp_keepers", "nfp_keepers", "labels")
      .forall(auditPost(_) === 0L),
      s"post-compaction the content stores hold no raw reference: $auditPost")
    assert(auditPost("tombstone_record") === 3L,
      "the ledger is permanent (keeper correction consults it)")
    // and serving still equals the batch twin over survivors + the new doc
    val surv3 = surv2.unionByName(
      Seq((60L, "a fresh post takedown document arrival")).toDF("doc_id", "text"))
    assert(served() === batchTwin(surv3))
  }

  test("embedding takedown: the bridge vector's removal splits the component; audit through compaction") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-embtakedown").toString
    EventStreams.embeddingClusterStoreInit(spark, root)
    // e0 and e1 share a sign-bucket (probed, deterministic), so their
    // SUM shares it by construction (every projection's sign agrees on
    // both, hence on the sum): {10,11}=e0, 20=e0+e1 the bridge,
    // {30,31}=e1 — cos(e0, e0+e1) ≈ 0.707 ≥ 0.35 both ways,
    // cos(e0, e1) = 0 below it
    val dim = 64
    def basis(i: Int): Seq[Float] =
      Seq.tabulate(dim)(k => if (k == i) 1.0f else 0.0f)
    val bridge = Seq.tabulate(dim)(k => if (k <= 1) 1.0f else 0.0f)
    val all = Seq(
      10L -> basis(0), 11L -> basis(0), 20L -> bridge,
      30L -> basis(1), 31L -> basis(1)).toDF("vec_id", "embedding")
      .localCheckpoint()
    EventStreams.applyEmbeddingBatch(
      all.filter($"vec_id".isInCollection(Seq(10L, 11L, 20L))), root, 0L)
    EventStreams.applyEmbeddingBatch(
      all.filter($"vec_id".isInCollection(Seq(30L, 31L))), root, 1L)
    def labels() = EventStreams.readLabelStore(spark, s"$root/labels")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(labels() === Seq(10L -> 10L, 11L -> 10L, 20L -> 10L,
      30L -> 10L, 31L -> 10L), "the bridge must merge both pairs")

    EventStreams.takedownEmbeddingVecs(spark, root, Seq(20L), tombId = 0L)
    assert(labels() === Seq(10L -> 10L, 11L -> 10L, 30L -> 30L, 31L -> 30L),
      "the component must split and re-name to surviving minima")
    // replay: same tombId is idempotent; a lower one is refused
    EventStreams.takedownEmbeddingVecs(spark, root, Seq(20L), tombId = 0L)
    assert(labels() === Seq(10L -> 10L, 11L -> 10L, 30L -> 30L, 31L -> 30L))
    EventStreams.takedownEmbeddingVecs(spark, root, Seq(31L), tombId = 1L)
    val err = intercept[IllegalArgumentException] {
      EventStreams.takedownEmbeddingVecs(spark, root, Seq(30L), tombId = 0L)
    }
    assert(err.getMessage.contains("monotonically increasing"))
    assert(labels() === Seq(10L -> 10L, 11L -> 10L, 30L -> 30L))
    // a replayed ingest batch containing a SINCE-TOMBSTONED vec cannot
    // resurrect it: the ledger gates the ingest boundary, so the
    // replayed row is dropped before it can re-land or re-merge the
    // repaired component (without the gate, the raw batch row would
    // pair with its surviving twin and pull it back into serving)
    EventStreams.applyEmbeddingBatch(
      all.filter($"vec_id".isInCollection(Seq(30L, 31L))), root, 1L)
    assert(labels() === Seq(10L -> 10L, 11L -> 10L, 30L -> 30L),
      "nothing resurrects through the replay")
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/vecs/b1").filter($"vec_id" === 31L).count() === 0,
      "the replay's overwrite physically drops the tombstoned row")

    // audit lifecycle: raw vec rows persist until compaction (the
    // newest delta is replay-fenced; a fresh ingest unfences it)
    val deleted = Seq(20L)
    def audit() = EventStreams.erasureAuditEmbedding(spark, root, deleted)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val pre = audit()
    assert(pre("vecs") > 0 && pre("labels") === 0 && pre("tombstone_record") === 1L,
      s"pre-compaction: $pre")
    EventStreams.applyEmbeddingBatch(
      Seq(40L -> basis(5)).toDF("vec_id", "embedding"), root, 2L)
    assert(EventStreams.compactEmbeddingClusterStores(spark, root, maxDeltas = 1))
    val post = audit()
    assert(post("vecs") === 0 && post("labels") === 0,
      s"post-compaction the content stores hold no raw reference: $post")
    assert(post("tombstone_record") === 1L)
  }

  test("cap-uncross detector: a takedown that shrinks a saturated bucket under the cap is reported") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-uncross").toString
    EventStreams.cascadeStoreInit(spark, root)
    val cap = 2
    // 4 docs with the identical shingle set → every band bucket holds
    // all four (the rebuild spec's construction): size 4 > cap, so
    // batch semantics drop the buckets wholesale
    def doc(i: Long) = (i, Seq.fill(10 + i.toInt)("mauve teal ochre").mkString(" "))
    EventStreams.applyCascadeBatch(Seq(doc(1), doc(2)).toDF("doc_id", "text"),
      root, 0L, maxBucket = cap, threshold = Threshold)
    EventStreams.applyCascadeBatch(Seq(doc(3), doc(4)).toDF("doc_id", "text"),
      root, 1L, maxBucket = cap, threshold = Threshold)
    assert(EventStreams.saturatedBandBuckets(spark, root, cap).count() > 0)
    // deleting two docs shrinks every bucket 4 → 2 ≤ cap: batch
    // semantics now EMIT the surviving pair's edges retroactively —
    // the takedown reports the uncrossing loudly
    val report = EventStreams.takedownCascadeDocs(spark, root, Seq(3L, 4L),
      tombId = 0L, threshold = Threshold, maxBucket = cap)
    assert(report.count() > 0, "the uncrossing must be reported")
    val row = report.select("n_all", "n_surviving").head
    assert(row.getLong(0) === 4L && row.getLong(1) === 2L)
    // and the saturation detector agrees the surviving store is calm
    assert(EventStreams.saturatedBandBuckets(spark, root, cap).count() === 0)
    // here streamed ≡ batch still holds: the surviving pair's edge
    // predates the saturation (their bucket was under-cap at batch 0),
    // so nothing retroactive is missing — the report exists for the
    // general case, where an uncrossed bucket's survivors never got
    // their edges and sit outside every affected component
    val surv = Seq(doc(1), doc(2)).toDF("doc_id", "text")
    assert(verdicts(EventStreams.readCascadeVerdicts(spark, root))
      === batchTwin(surv))
  }

  // ---- span-tree takedown face (store + layout + label consumers) ----

  private def spanRows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select("doc_a", "doc_b", "n_shared_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  private def spanTwin(docs: DataFrame): Seq[(Long, Long, Long)] =
    spanRows(TextAnalysis.sharedSpansOf(TextAnalysis.winnowOf(docs)))

  test("span takedown: serving ≡ batch recompute over survivors; ingest/replay guards; audit through compaction") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-spantakedown").toString
    val (storeDir, layoutDir) = (s"$root/store", s"$root/layout")
    val common = (0 until 12).map(i => s"shared$i").mkString(" ")
    val other = (0 until 12).map(i => s"pairspan$i").mkString(" ")
    def d(i: Long, span: String) = (i, s"u${i}a u${i}b u${i}c " + span)
    val all = Seq(d(1, common), d(2, common), d(3, common), d(4, common),
      d(5, other), d(6, other),
      (7L, "a lone document with no shared span at all here"))
      .toDF("doc_id", "text").localCheckpoint()
    def docsOf(ids: Long*) = all.filter($"doc_id".isInCollection(ids))
    TextAnalysis.winnowOf(docsOf(1L, 2L, 5L)).write.parquet(s"$storeDir/base")
    TextAnalysis.sharedSpansOf(TextAnalysis.winnowOf(docsOf(1L, 2L, 5L)))
      .write.parquet(s"$layoutDir/base")
    EventStreams.applySpanBatch(docsOf(3L, 6L), storeDir, layoutDir, 0L)
    EventStreams.applySpanBatch(docsOf(4L, 7L), storeDir, layoutDir, 1L)
    def served() = spanRows(EventStreams.readSpanLayoutDeltas(spark, layoutDir))
    assert(served() === spanTwin(all), "incremental union ≡ batch recompute")

    // takedown 1: a member of the 4-clique
    val rep1 = EventStreams.takedownSpanDocs(spark, storeDir, layoutDir,
      Seq(2L), tombId = 0L)
    assert(rep1.count() === 0, "no posting list is df-capped in this fixture")
    assert(served() === spanTwin(docsOf(1L, 3L, 4L, 5L, 6L, 7L)))
    // takedown 2: one endpoint of the (5,6) pair plus another clique member
    EventStreams.takedownSpanDocs(spark, storeDir, layoutDir,
      Seq(5L, 3L), tombId = 1L)
    assert(served() === spanTwin(docsOf(1L, 4L, 6L, 7L)))

    // replay contracts: a lower tombId is refused before any write...
    val err = intercept[IllegalArgumentException] {
      EventStreams.takedownSpanDocs(spark, storeDir, layoutDir,
        Seq(7L), tombId = 0L)
    }
    assert(err.getMessage.contains("monotonically increasing"))
    assert(served() === spanTwin(docsOf(1L, 4L, 6L, 7L)))
    // ...exact replay is idempotent...
    EventStreams.takedownSpanDocs(spark, storeDir, layoutDir,
      Seq(5L, 3L), tombId = 1L)
    assert(served() === spanTwin(docsOf(1L, 4L, 6L, 7L)))
    // ...and a replayed ingest batch carrying a since-taken-down doc
    // cannot resurrect it (the ledger gates the ingest boundary)
    EventStreams.applySpanBatch(docsOf(3L, 6L), storeDir, layoutDir, 0L)
    assert(served() === spanTwin(docsOf(1L, 4L, 6L, 7L)))
    assert(spark.read.parquet(s"$storeDir/b0")
      .filter($"doc_id" === 3L).count() === 0,
      "the replay's overwrite physically drops the tombstoned doc's fps")

    // audit lifecycle: raw rows persist until compaction; the ledger
    // is permanent
    val deleted = Seq(2L, 5L, 3L)
    def audit() = EventStreams.erasureAuditSpan(spark, storeDir, layoutDir,
      deleted).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val pre = audit()
    assert(pre("fp_store") > 0 && pre("span_pairs") > 0
      && pre("tombstone_record") === 3L, s"pre-compaction: $pre")
    // a fresh ingest unfences the pre-takedown deltas, then compaction
    // erases physically
    EventStreams.applySpanBatch(
      Seq((8L, "an entirely fresh arrival talking about new things"))
        .toDF("doc_id", "text"), storeDir, layoutDir, 2L)
    assert(EventStreams.compactSpanStore(spark, storeDir, maxDeltas = 1))
    assert(EventStreams.compactSpanLayout(spark, layoutDir, maxDeltas = 1))
    val post = audit()
    assert(post("fp_store") === 0L && post("span_pairs") === 0L,
      s"post-compaction the content stores hold no raw reference: $post")
    assert(post("tombstone_record") === 3L)
    val survPlus = docsOf(1L, 4L, 6L, 7L).unionByName(
      Seq((8L, "an entirely fresh arrival talking about new things"))
        .toDF("doc_id", "text"))
    assert(served() === spanTwin(survPlus))
  }

  test("span replay after both writes landed is content-identical (own-delta exclusion in the store probe)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-spanreplay").toString
    val (storeDir, layoutDir) = (s"$root/store", s"$root/layout")
    val span = (0 until 12).map(i => s"repl$i").mkString(" ")
    val seed = Seq((1L, s"s1a s1b s1c $span")).toDF("doc_id", "text")
    val batch = Seq((2L, s"s2a s2b s2c $span"), (3L, s"s3a s3b s3c $span"))
      .toDF("doc_id", "text")
    TextAnalysis.winnowOf(seed).write.parquet(s"$storeDir/base")
    TextAnalysis.sharedSpansOf(TextAnalysis.winnowOf(seed))
      .write.parquet(s"$layoutDir/base")
    EventStreams.applySpanBatch(batch, storeDir, layoutDir, 0L)
    val first = spanRows(EventStreams.readSpanLayoutDeltas(spark, layoutDir))
    // the at-least-once case: both writes landed, the checkpoint did
    // not commit, the batch replays. Without the own-delta exclusion
    // the probe would see the batch's own stored fps — every batch doc
    // self-pairs and the intra-batch pair (2,3) lands twice
    EventStreams.applySpanBatch(batch, storeDir, layoutDir, 0L)
    val replayed = spanRows(EventStreams.readSpanLayoutDeltas(spark, layoutDir))
    assert(replayed === first, "replay must overwrite with identical content")
    assert(replayed.forall { case (a, b, _) => a < b }, "no self-pairs")
    assert(first === spanTwin(seed.unionByName(batch)))
  }

  test("label-store takedown: component split + cluster rename via survivor edges; ingest gate blocks resurrection") {
    import spark.implicits._
    val storeDir = Files.createTempDirectory("graft-labeltakedown")
      .toString + "/labels"
    EventStreams.labelStoreInit(
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
        .toDF("doc_id", "cluster_id"), storeDir)
    // the edge source this store was maintained from: 2 bridges {1,3}
    val edgesAll = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
      .localCheckpoint()
    def labels() = EventStreams.readLabelStore(spark, storeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    def survivorEdges(tombs: Seq[Long])(survivors: DataFrame): DataFrame =
      edgesAll.filter(!$"src".isInCollection(tombs) &&
        !$"dst".isInCollection(tombs))

    // takedown the bridge: the component must split into singletons
    EventStreams.takedownLabelDocs(spark, storeDir, Seq(2L), tombId = 0L)(
      survivorEdges(Seq(2L)))
    assert(labels() === Seq(1L -> 1L, 3L -> 3L, 10L -> 10L, 11L -> 10L))
    // takedown a cluster NAME (10 names component {10,11})
    EventStreams.takedownLabelDocs(spark, storeDir, Seq(10L), tombId = 1L)(
      survivorEdges(Seq(2L, 10L)))
    assert(labels() === Seq(1L -> 1L, 3L -> 3L, 11L -> 11L),
      "the orphaned survivor must relabel to itself")
    // replay guards
    val err = intercept[IllegalArgumentException] {
      EventStreams.takedownLabelDocs(spark, storeDir, Seq(3L), tombId = 0L)(
        survivorEdges(Seq(2L, 10L, 3L)))
    }
    assert(err.getMessage.contains("monotonically increasing"))
    EventStreams.takedownLabelDocs(spark, storeDir, Seq(10L), tombId = 1L)(
      survivorEdges(Seq(2L, 10L)))
    assert(labels() === Seq(1L -> 1L, 3L -> 3L, 11L -> 11L))
    // ingest gate: a replayed edge batch naming tombstoned docs cannot
    // resurrect them or re-merge; genuinely new edges still apply
    EventStreams.applyLabelBatch(
      Seq((1L, 2L), (2L, 3L), (3L, 12L)).toDF("src", "dst"), storeDir, 0L)
    assert(labels() === Seq(1L -> 1L, 3L -> 3L, 11L -> 11L, 12L -> 3L),
      "gated edges dropped, the new (3,12) edge merged")
    // audit: the repair erased physically; the ledger is permanent
    val audit = EventStreams.erasureAuditLabels(spark, storeDir, Seq(2L, 10L))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(audit("labels") === 0L && audit("tombstone_record") === 2L,
      s"audit: $audit")
    // crash-window defense: a ledger generation written without its
    // repair (the takedown crashed mid-verb) still hides the doc at
    // read; the re-run then makes it physical
    Seq(12L).toDF("doc_id").write.mode("overwrite")
      .parquet(s"$storeDir.tombstones/t2")
    assert(labels() === Seq(1L -> 1L, 3L -> 3L, 11L -> 11L),
      "the read-side filter covers the crash window")
    EventStreams.takedownLabelDocs(spark, storeDir, Seq(12L), tombId = 2L)(
      survivorEdges(Seq(2L, 10L, 12L)))
    assert(labels() === Seq(1L -> 1L, 3L -> 3L, 11L -> 11L))
  }

  test("span df-uncross: a takedown shrinking a boilerplate-capped posting list is reported; rebuild restores batch semantics under the replay fence") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-spanuncross").toString
    val (storeDir, layoutDir) = (s"$root/store", s"$root/layout")
    val boiler = (0 until 8).map(i => s"boiler$i").mkString(" ")
    val seedDocs = (1L to 66L).map(i => (i, boiler)).toDF("doc_id", "text")
      .localCheckpoint()
    // 66 identical docs: every interior fp's posting list is 66 > 64
    // (MaxSpanDf) — the seed layout drops ALL their pairs wholesale
    TextAnalysis.winnowOf(seedDocs).write.parquet(s"$storeDir/base")
    TextAnalysis.sharedSpansOf(TextAnalysis.winnowOf(seedDocs))
      .write.parquet(s"$layoutDir/base")
    assert(spark.read.parquet(s"$layoutDir/base").count() === 0)
    // one streamed pair with its own span, to exercise the rebuild's
    // replay fence (its delta must survive the rebuild un-folded)
    val freshSpan = (0 until 12).map(i => s"fresh$i").mkString(" ")
    val fresh = Seq((100L, s"f1a f1b f1c $freshSpan"),
      (101L, s"f2a f2b f2c $freshSpan"))
      .toDF("doc_id", "text").localCheckpoint()
    EventStreams.applySpanBatch(fresh, storeDir, layoutDir, 0L)
    def served() = spanRows(EventStreams.readSpanLayoutDeltas(spark, layoutDir))
    assert(served().nonEmpty, "the fresh pair is served")

    // deleting 3 docs shrinks every boiler posting list 66 → 63 ≤ 64:
    // the survivors are owed pair rows no ingest ever emitted
    val report = EventStreams.takedownSpanDocs(spark, storeDir, layoutDir,
      Seq(1L, 2L, 3L), tombId = 0L)
    assert(report.count() > 0, "the df-uncrossing must be reported")
    val row = report.select("n_all", "n_surviving").head
    assert(row.getLong(0) === 66L && row.getLong(1) === 63L)
    val survivors = seedDocs.filter($"doc_id" > 3L).unionByName(fresh)
    assert(served() !== spanTwin(survivors),
      "pre-rebuild the served layout under-reports (the divergence the report names)")

    EventStreams.rebuildSpanLayout(spark, storeDir, layoutDir)
    assert(served() === spanTwin(survivors),
      "the rebuild restores batch-over-survivors semantics")
    // the fence: the newest delta survived the rebuild and a replayed
    // ingest overwrites it content-identically (base excluded its pairs)
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$layoutDir/b0")))
    EventStreams.applySpanBatch(fresh, storeDir, layoutDir, 0L)
    assert(served() === spanTwin(survivors))
  }
}
