package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
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
}
