package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal-column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with a typed metadata struct, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The actual codec work is STUBBED — no image/audio libraries exist
  * in this container — behind `decodeStub`, a clearly-marked
  * deterministic fake. Everything Spark-side is real and tested: the
  * schema, the partition-wise batch shape (`mapPartitions` over a
  * typed Dataset — the JVM analog of a Pandas-UDF `mapInPandas`
  * pipeline), and the pure-expression frame sampler.
  */
object Multimodal {

  /** One media item: opaque payload + typed metadata. */
  final case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte],
    width: Int, height: Int, duration_ms: Long)

  /** Extracted features for one media item (what a real decoder would
    * hand the training pipeline).
    */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    checksum: String, features: Array[Double])

  /** Synthesize a media table from `documents` (text bytes standing in
    * for an encoded payload) so the plumbing runs against real
    * testdata shapes.
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text", $"n_chars")
      .withColumn("kind",
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1))
      .select(
        $"doc_id".as("media_id"),
        $"kind",
        encode($"text", "UTF-8").as("bytes"),
        ($"n_chars" % 640).cast("int").as("width"),
        ($"n_chars" % 480).cast("int").as("height"),
        ($"n_chars" * 10).as("duration_ms"))
      .as[MediaRecord]
  }

  /** The deterministic fallback features (payload-MD5-derived dyadic
    * rationals) — used for kinds with no in-container codec (audio,
    * video) and payloads that fail to parse.
    */
  private def stubFeatures(md5: Array[Byte]): Array[Double] =
    Array.tabulate(8)(i => ((md5(i) & 0xff) - 128) / 128.0)

  /** REAL image decode: `javax.imageio` ships in the JDK, so PNG/BMP/
    * GIF/JPEG payloads decode to pixels with no external library. The
    * 8-dim feature vector is exact integer-sum arithmetic over the
    * pixel grid (channel means, gray extremes, normalized dims), so it
    * is deterministic across partitionings and reruns. Returns None
    * when the payload is not a parseable image.
    */
  /** Container-format magic bytes for the decoders the JDK ships
    * (PNG, JPEG, GIF, BMP) — a 4-byte sniff that lets non-image
    * payloads skip ImageIO's reader-registry scan entirely (it costs
    * a stream + SPI lookup per call, which is pure waste on a mostly-
    * text corpus).
    */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  private[operators] def imageFeatures(bytes: Array[Byte]): Option[Array[Double]] = {
    if (!looksLikeImage(bytes)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var mnGray = 255; var mxGray = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sr += r; sg += g; sb += b
            val gray = (r + g + b) / 3
            if (gray < mnGray) mnGray = gray
            if (gray > mxGray) mxGray = gray
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some(Array(
          sr.toDouble / (n * 255.0),
          sg.toDouble / (n * 255.0),
          sb.toDouble / (n * 255.0),
          (sr + sg + sb).toDouble / (n * 3.0 * 255.0),
          mnGray / 255.0,
          mxGray / 255.0,
          w / 4096.0,
          h / 4096.0))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The decode seam: partition-wise over the typed Dataset — one
    * iterator per partition, records streamed, per-partition codec
    * init — the exact batch shape a vectorized decoder needs. `image`
    * payloads decode for REAL ([[imageFeatures]]); audio/video kinds
    * (no codec in this container) and unparseable payloads fall back
    * to the deterministic stub features so the pipeline is total.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init (a real deployment opens its codecs here once)
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        digest.reset()
        val h = digest.digest(m.bytes)
        val feats =
          (if (m.kind == "image") imageFeatures(m.bytes) else None)
            .getOrElse(stubFeatures(h))
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
          h.map("%02x".format(_)).mkString, feats)
      }
    }
  }

  /** The always-stub variant (every kind gets MD5 features) — kept as
    * the deterministic cross-engine surface the mm_feature_topk oracle
    * replays from md5(text).
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        digest.reset()
        val h = digest.digest(m.bytes)
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
          h.map("%02x".format(_)).mkString, stubFeatures(h))
      }
    }
  }

  /** Frame sampling as a pure expression pipeline (no UDF): split the
    * payload into fixed-size "frames" and keep every `stride`-th one.
    * Column pruning and predicate pushdown survive because this is all
    * Catalyst expressions.
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        ceil(length(col("bytes")) / lit(frameBytes.toDouble)).cast("int"))
      // empty payloads must yield zero frames — sequence(0, -1) would
      // otherwise step BACKWARDS and emit phantom rows
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("kind"), col("bytes"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("media_id"), col("kind"), col("frame_idx"),
        expr(s"substring(bytes, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"))

  /** Resize is metadata-only at this layer (a real implementation
    * rewrites pixels in decodeStub's seam): clamp the declared
    * dimensions, preserving aspect. The scale factor is materialised
    * BEFORE either dimension is replaced — `withColumn("width", …)`
    * would otherwise make the height step's scale expression re-resolve
    * `width` against the already-resized value and never shrink height.
    */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), greatest(col("height"), lit(1))))
    media
      .withColumn("__scale", scale)
      .withColumn("width", (col("width") * col("__scale")).cast("int"))
      .withColumn("height", (col("height") * col("__scale")).cast("int"))
      .drop("__scale")
  }

  /** Oracle-checkable slice of the binary plumbing: byte lengths and
    * content hashes of the synthesized payload column.
    */
  def binaryStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        $"doc_id",
        octet_length($"text").cast("long").as("n_bytes"),
        md5($"text").as("payload_md5"),
        md5(substring($"text", 1, 64)).as("head_md5"))
      .orderBy($"doc_id")
  }

  /** Blocks in the [[aHash]] signature (mirrored in the oracle SQL). */
  val AHashBlocks = 16

  /** Blockwise average-hash — PERCEPTUAL dedup for opaque media
    * columns WITHOUT any decode (the aHash idea applied to raw bytes):
    * the payload is cut into [[AHashBlocks]] balanced byte blocks,
    * each block's mean is compared to the payload mean, and the 16
    * above/below bits form the signature; payloads sharing a signature
    * are near-dup candidates (robust to localized byte edits in ways
    * md5 structurally is not). The comparison is cross-multiplied
    * integer sums (`blocksum·n > total·blockcnt`) — no division, no
    * doubles, so the oracle replays it bit-for-bit.
    *
    * Shape (r7): the 16 block sums are computed in ONE pass over each
    * payload's raw byte array inside the partition-wise codec seam
    * ([[decode]]'s shape) — 16 accumulators per record, zero
    * intermediate rows. The r6 form ([[aHashExplode]], kept as the
    * oracle mirror) generated one row per payload byte via posexplode
    * plus an O(i) `substr` seek per byte: green and fast on sf-scale
    * docs but quadratic per record and ~10⁶ rows per MB — precisely
    * the wrong shape for the opaque-media payloads this operator
    * exists for. A differential spec pins the two forms equal on the
    * documents table. Downstream the per-signature sharing count
    * joins back via broadcast — the signature domain is ≤ 2¹⁶ rows,
    * bounded by construction, so the join never shuffles the corpus.
    */
  def aHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = Tables.load(spark, dir, "documents")
      .select($"doc_id", expr("CAST(text AS BINARY)").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          // empty payloads vanish, matching the mirror's empty explode
          if (payload.isEmpty) None else Some((id, aHashOf(payload)))
        }
      }
      .toDF("doc_id", "ahash")
    val groups = sig.groupBy($"ahash").agg(count(lit(1)).as("n_sharing"))
    sig.join(broadcast(groups), "ahash")
      .select($"doc_id", $"ahash", $"n_sharing")
      .orderBy($"doc_id")
  }

  /** One pass over a payload's bytes → the [[AHashBlocks]]-bit
    * signature: 16 sum/count accumulators, then the cross-multiplied
    * above-mean test per block. Bytes are unsigned (opaque media
    * semantics); the posexplode mirror and the DuckDB oracle iterate
    * the same UTF-8 octets (not characters), so parity holds on
    * non-ASCII payloads too. Comparison falls back
    * to BigInt past ~190 MB payloads where 255·n² would wrap a long.
    */
  private[graft] def aHashOf(payload: Array[Byte]): Long = {
    val n = payload.length
    val sums = new Array[Long](AHashBlocks)
    val cnts = new Array[Long](AHashBlocks)
    var i = 0
    while (i < n) {
      val b = (i.toLong * AHashBlocks / n).toInt
      sums(b) += (payload(i) & 0xff).toLong
      cnts(b) += 1L
      i += 1
    }
    var total = 0L
    var j = 0
    while (j < AHashBlocks) { total += sums(j); j += 1 }
    val big = n > 100000000
    var sigBits = 0L
    j = 0
    while (j < AHashBlocks) {
      val above =
        if (big) BigInt(sums(j)) * n > BigInt(total) * cnts(j)
        else sums(j) * n > total * cnts(j)
      if (above) sigBits |= 1L << j
      j += 1
    }
    sigBits
  }

  /** The r6 posexplode form, retained verbatim as the cross-engine
    * mirror of the `mm_ahash` oracle SQL and differential-spec'd
    * against [[aHash]] — NOT the production shape (row-per-byte
    * explode + O(i) substr seeks; see [[aHash]]).
    */
  def aHashExplode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bytes = Tables.load(spark, dir, "documents")
      .select($"doc_id", octet_length($"text").cast("long").as("n"),
        // BYTE-based like aHashOf (UTF-8 octets via substring on BINARY),
        // not per-character ascii(): the two only coincide on ASCII, and
        // the contract is bytes-of-the-payload (r7 advice)
        posexplode(expr(
          "slice(transform(sequence(1, greatest(octet_length(text), 1)), i -> CAST(conv(hex(substring(CAST(text AS BINARY), i, 1)), 16, 10) AS BIGINT)), 1, octet_length(text))"))
          .as(Seq("idx", "byte")))
    val blocks = bytes
      .withColumn("block", expr(s"(idx * $AHashBlocks) div n"))
      .groupBy($"doc_id", $"n", $"block")
      .agg(sum($"byte").as("bsum"), count(lit(1)).as("bcnt"))
    val sig = blocks
      .groupBy($"doc_id", $"n")
      .agg(sum($"bsum").as("total"),
        collect_list(struct($"block", $"bsum", $"bcnt")).as("bs"))
      // DECIMAL before multiplying (the trendSlope wrap lesson):
      // bsum·n ≈ 127·len² passes 2⁶³ near gigabyte payloads
      .withColumn("ahash", expr(
        """aggregate(bs, CAST(0 AS BIGINT),
          |  (acc, x) -> acc + CASE WHEN CAST(x.bsum AS DECIMAL(19,0)) * n
          |                              > CAST(total AS DECIMAL(19,0)) * x.bcnt
          |                         THEN shiftleft(CAST(1 AS BIGINT), CAST(x.block AS INT))
          |                         ELSE CAST(0 AS BIGINT) END)""".stripMargin))
      .select($"doc_id", $"ahash")
    val groups = sig.groupBy($"ahash").agg(count(lit(1)).as("n_sharing"))
    sig.join(groups, "ahash")
      .select($"doc_id", $"ahash", $"n_sharing")
      .orderBy($"doc_id")
  }

  /** Hamming radius and band-bucket saturation cap for
    * [[aHashPairs]] (mirrored in the oracle SQL). Three bands of
    * 5/5/6 bits pigeonhole radius 2: ≤2 flipped bits touch ≤2 bands,
    * so one band always matches exactly. Buckets holding more than
    * [[AHashBandCap]] docs are saturated — a 5-bit band has only 32
    * values, so dense corpora WILL saturate them; the cap bounds the
    * quadratic pair expansion deterministically (both engines drop
    * the same buckets), trading recall for a hard cost ceiling, the
    * [[graft.operators.Dedup.MaxBandBucket]] precedent.
    */
  val AHashMaxHamming = 2
  val AHashBandCap = 64

  /** Near-dup MEDIA pairs — [[aHash]]'s pairing step: every doc pair
    * whose 16-bit blockwise signatures differ in ≤ [[AHashMaxHamming]]
    * bits (localized byte edits flip few blocks; md5 equality would
    * miss all of them). Banded exactly like simhash pairing: each
    * signature posts into 3 band buckets, candidates join within a
    * bucket only, and the exact `bit_count(xor)` filter verifies —
    * never an all-pairs self-join. All shuffles key on (band, value)
    * or the pair; the band-cap makes the worst case linear in corpus
    * size.
    */
  def aHashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = Tables.load(spark, dir, "documents")
      .select($"doc_id", expr("CAST(text AS BINARY)").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        if (payload.isEmpty) None else Some((id, aHashOf(payload)))
      })
      .toDF("doc_id", "ahash")
    val banded = sig.select($"doc_id", $"ahash",
      posexplode(array(
        expr("ahash % 32"), expr("(ahash div 32) % 32"), expr("ahash div 1024")))
        .as(Seq("band", "bk")))
    val kept = banded.groupBy($"band", $"bk")
      .agg(count(lit(1)).as("bn"))
      .filter($"bn" <= AHashBandCap)
      .select($"band", $"bk")
    val inBand = banded.join(kept, Seq("band", "bk"))
    inBand.as("a")
      .join(inBand.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.ahash ^ b.ahash) AS BIGINT)").as("hamming"))
      .filter($"hamming" <= AHashMaxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Media-feature ANN: the decode seam's 8-dim feature vectors fed
    * straight into the generic exact cosine top-k — the end-to-end
    * multimodal story (binary payload → partition-wise decode →
    * similarity search). The stub's features are dyadic rationals
    * ((byte−128)/128), so every dot product is EXACT in double
    * arithmetic and the DuckDB oracle reproduces it bit-for-bit from
    * md5(text).
    */
  def mediaFeatureTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the REAL seam: image payloads would decode to pixel features
    // here; the synthesized text payloads never parse as images, so
    // every record takes the stub fallback and the md5(text) oracle
    // replays the result exactly (MultimodalSpec pins that equality)
    Similarity.cosineTopKOver(
      decode(fromDocuments(spark, dir)).toDF(), "media_id", "features")
      .select($"q_id", $"vec_id".as("media_id"), $"cos", $"rnk")
  }

  /** Frame size / keep-stride for [[frameSampleQuery]] (mirrored in
    * the oracle SQL).
    */
  val FrameBytes = 32
  val FrameStride = 4

  /** [[frameSample]] over the synthesized media table as an
    * oracle-checked query: every kept frame's index, byte length and
    * content hash. The oracle replays the byte slicing as character
    * substr — equal because the fixture text is ASCII (the same
    * 1-byte-per-char premise `mm_binary_stats`'s md5(text) parity
    * already rests on).
    */
  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    frameSample(fromDocuments(spark, dir).toDF(), FrameBytes, FrameStride)
      .select($"media_id", $"kind", $"frame_idx".cast("long").as("frame_idx"),
        length($"frame").cast("long").as("frame_bytes"),
        md5($"frame").as("frame_md5"))
      .orderBy($"media_id", $"frame_idx")
  }

  /** Clamp dimension for [[resizeMetaQuery]] (mirrored in the oracle). */
  val ResizeMaxDim = 256

  /** [[resizeMeta]] over the synthesized media table as an
    * oracle-checked query. The scale is an IEEE double on both engines
    * (identical division/multiply), and the truncating int cast is
    * made explicit in the oracle (`trunc` before CAST — DuckDB's bare
    * double→INT cast ROUNDS where Spark's truncates).
    */
  def resizeMetaQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resizeMeta(fromDocuments(spark, dir).toDF(), ResizeMaxDim)
      .select($"media_id", $"kind", $"width", $"height", $"duration_ms")
      .orderBy($"media_id")
  }

  /** Fixed-point scale for [[whashOf]]'s block means (mirrored in the
    * oracle): mean_i = (bsum_i · 1024) div bcnt_i.
    */
  val WHashMeanScale = 1024L

  /** WALSH–HADAMARD spectral hash — the pHash idea (perceptual hash =
    * sign bits of a payload's low-frequency transform) restated with
    * an INTEGER-EXACT transform: the classic pHash takes a DCT, whose
    * cosine coefficients are IEEE doubles no cross-engine oracle can
    * pin; the 16-point Walsh–Hadamard transform spans the same
    * "global structure vs local detail" decomposition with ±1
    * coefficients only, so every output is an exact integer sum of
    * fixed-point block means. Bit k (k = 1..15; the DC term is
    * excluded — it is always positive) is set iff
    * `Σ_i (−1)^popcount(k AND i) · mean_i > 0`. Compared to
    * [[aHash]] (threshold-vs-mean per block) the WHT bits are
    * BASIS-FUNCTION signs — robust to uniform brightness shifts that
    * flip many aHash bits at once. Empty blocks (payloads under 16
    * bytes) contribute mean 0.
    */
  private[graft] def whashOf(payload: Array[Byte]): Long = {
    val n = payload.length
    val sums = new Array[Long](AHashBlocks)
    val cnts = new Array[Long](AHashBlocks)
    var i = 0
    while (i < n) {
      val b = (i.toLong * AHashBlocks / n).toInt
      sums(b) += (payload(i) & 0xff).toLong
      cnts(b) += 1L
      i += 1
    }
    val means = Array.tabulate(AHashBlocks)(j =>
      if (cnts(j) == 0L) 0L else sums(j) * WHashMeanScale / cnts(j))
    var bits = 0L
    var k = 1
    while (k < AHashBlocks) {
      var coef = 0L
      var j = 0
      while (j < AHashBlocks) {
        if (java.lang.Long.bitCount((k & j).toLong) % 2 == 0) coef += means(j)
        else coef -= means(j)
        j += 1
      }
      if (coef > 0L) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** [[whashOf]] surfaced as the grouped near-dup query ([[aHash]]'s
    * shape: signature + sharing count; the banded pairing step drops
    * in unchanged because the signature domain is the same 16 bits).
    */
  def wHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // materialize: sig feeds both the sharing aggregate and the final
    // join — unmaterialized, the per-payload JVM hash scan would run
    // twice (localCheckpoint over cache for the same GC-reclaim
    // reason as the cascade corpus)
    val sig = Tables.load(spark, dir, "documents")
      .select($"doc_id", expr("CAST(text AS BINARY)").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        if (payload.isEmpty) None else Some((id, whashOf(payload)))
      })
      .toDF("doc_id", "whash")
      .localCheckpoint()
    val groups = sig.groupBy($"whash").agg(count(lit(1)).as("n_sharing"))
    sig.join(broadcast(groups), "whash")
      .select($"doc_id", $"whash", $"n_sharing")
      .orderBy($"doc_id")
  }

  /** Per-sampled-frame DSP features over the opaque payload — the
    * audio-flavored half of the multimodal plumbing ([[frameSample]]
    * is the sampler; this is what a feature extractor computes per
    * frame): scaled variance ENERGY `Σ (b·n − s)²` and mean-centered
    * ZERO CROSSINGS (adjacent deviations with strictly opposite
    * signs) — both exact integers (b·n ≤ 255·32, the squared term
    * ×32 stays far under 2⁶³). Centering on the frame's OWN mean
    * (cross-multiplied, never a division) is what makes crossings
    * meaningful on unsigned bytes. Map-only: sampler explode + two
    * in-row folds, zero shuffle at any corpus size.
    */
  def frameEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    frameSample(fromDocuments(spark, dir).toDF(), FrameBytes, FrameStride)
      .withColumn("bs", expr(
        "transform(sequence(1, octet_length(frame)), i -> " +
          "CAST(conv(hex(substring(frame, i, 1)), 16, 10) AS BIGINT))"))
      .withColumn("n", size($"bs").cast("long"))
      .withColumn("s", expr("aggregate(bs, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("energy", expr(
        "aggregate(transform(bs, x -> (x * n - s) * (x * n - s)), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("crossings", expr(
        "aggregate(zip_with(slice(bs, 1, CAST(n - 1 AS INT)), slice(bs, 2, CAST(n - 1 AS INT)), " +
          "(x, y) -> CASE WHEN (x * n - s) * (y * n - s) < 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .select($"media_id", $"frame_idx".cast("long").as("frame_idx"),
        $"n".as("frame_bytes"), $"energy", $"crossings")
      .orderBy($"media_id", $"frame_idx")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_stats" -> binaryStats _,
    "mm_ahash" -> aHash _,
    "mm_ahash_pairs" -> aHashPairs _,
    "mm_whash" -> wHash _,
    "mm_frame_energy" -> frameEnergy _,
    "mm_feature_topk" -> mediaFeatureTopK _,
    "mm_frame_sample" -> frameSampleQuery _,
    "mm_resize_meta" -> resizeMetaQuery _,
  )

  /** [[wHash]]'s oracle: the aHash block machinery densified to all
    * 16 blocks (absent blocks → mean 0), then the 15 WHT coefficients
    * as literal ±-sign sums generated from the same popcount parity
    * the Scala side uses — the transform is unrolled into the SQL, so
    * any drift in the sign matrix breaks the hash compare.
    */
  private def whashOracle: String = {
    val k = AHashBlocks
    val coefExprs = (1 until k).map { kk =>
      val terms = (0 until k).map { j =>
        val sgn = if (java.lang.Long.bitCount((kk & j).toLong) % 2 == 0) "+" else "-"
        s"$sgn m[${j + 1}]"
      }.mkString(" ")
      s"CASE WHEN ($terms) > 0 THEN (CAST(1 AS BIGINT) << $kk) ELSE CAST(0 AS BIGINT) END"
    }.mkString("\n|          + ")
    s"""WITH b AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n,
      |         unnest(generate_series(0, octet_length(encode(text)) - 1)) AS idx,
      |         unnest(list_transform(generate_series(1, octet_length(encode(text))),
      |           i -> 16 * (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1)) - 1)
      |              + (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)) - 1))) AS byte
      |  FROM documents),
      |blk AS (SELECT doc_id, (idx * $AHashBlocks) // n AS block,
      |          CAST(sum(byte) AS BIGINT) AS bsum, count(*) AS bcnt
      |        FROM b GROUP BY 1, 2),
      |dgrid AS (SELECT DISTINCT doc_id FROM blk),
      |dense AS (SELECT g.doc_id, gs.block,
      |            coalesce((blk.bsum * $WHashMeanScale) // blk.bcnt, 0) AS ms
      |          FROM dgrid g
      |          CROSS JOIN (SELECT unnest(generate_series(0, ${k - 1})) AS block) gs
      |          LEFT JOIN blk ON blk.doc_id = g.doc_id AND blk.block = gs.block),
      |mv AS (SELECT doc_id, list(ms ORDER BY block) AS m FROM dense GROUP BY 1),
      |sig AS (SELECT doc_id, CAST($coefExprs AS BIGINT) AS whash FROM mv),
      |wg AS (SELECT whash, count(*) AS n_sharing FROM sig GROUP BY 1)
      |SELECT doc_id, whash, n_sharing
      |FROM sig JOIN wg USING (whash)
      |ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "mm_whash" -> whashOracle,
    "mm_frame_energy" ->
      s"""WITH m AS (SELECT doc_id AS media_id, text,
        |             CAST(ceil(strlen(text) / $FrameBytes.0) AS INT) AS n_frames
        |           FROM documents),
        |fr AS (SELECT media_id,
        |         unnest(generate_series(0, n_frames - 1)) AS frame_idx, text
        |       FROM m WHERE n_frames > 0),
        |fx AS (SELECT media_id, frame_idx,
        |         substr(text, frame_idx * $FrameBytes + 1, $FrameBytes) AS fe
        |       FROM fr WHERE frame_idx % $FrameStride = 0),
        |fb AS (SELECT media_id, frame_idx,
        |         CAST(strlen(fe) AS BIGINT) AS n,
        |         list_transform(generate_series(1, strlen(fe)),
        |           i -> CAST(ascii(substr(fe, i, 1)) AS BIGINT)) AS bs
        |       FROM fx),
        |fs AS (SELECT *, CAST(list_aggregate(bs, 'sum') AS BIGINT) AS s FROM fb)
        |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx, n AS frame_bytes,
        |       CAST(list_aggregate(list_transform(bs,
        |         x -> (x * n - s) * (x * n - s)), 'sum') AS BIGINT) AS energy,
        |       CAST(coalesce(list_aggregate(list_transform(
        |           generate_series(1, CAST(n - 1 AS INT)),
        |           i -> CASE WHEN (bs[i] * n - s) * (bs[i+1] * n - s) < 0
        |                     THEN 1 ELSE 0 END), 'sum'), 0) AS BIGINT) AS crossings
        |FROM fs ORDER BY media_id, frame_idx""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH m AS (SELECT doc_id AS media_id,
        |             CASE doc_id % 3 WHEN 0 THEN 'image'
        |                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |             text,
        |             CAST(ceil(strlen(text) / $FrameBytes.0) AS INT) AS n_frames
        |           FROM documents),
        |fr AS (SELECT media_id, kind, text,
        |         unnest(generate_series(0, n_frames - 1)) AS frame_idx
        |       FROM m WHERE n_frames > 0)
        |SELECT media_id, kind, CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(strlen(substr(text, frame_idx * $FrameBytes + 1, $FrameBytes)) AS BIGINT) AS frame_bytes,
        |       md5(substr(text, frame_idx * $FrameBytes + 1, $FrameBytes)) AS frame_md5
        |FROM fr WHERE frame_idx % $FrameStride = 0
        |ORDER BY media_id, frame_idx""".stripMargin,
    "mm_resize_meta" ->
      s"""WITH m AS (SELECT doc_id AS media_id,
        |             CASE doc_id % 3 WHEN 0 THEN 'image'
        |                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |             CAST(n_chars % 640 AS INT) AS width,
        |             CAST(n_chars % 480 AS INT) AS height,
        |             CAST(n_chars * 10 AS BIGINT) AS duration_ms
        |           FROM documents),
        |s AS (SELECT *,
        |        least(1.0, $ResizeMaxDim.0 / greatest(width, height, 1)) AS scale
        |      FROM m)
        |SELECT media_id, kind,
        |       CAST(trunc(width * scale) AS INT) AS width,
        |       CAST(trunc(height * scale) AS INT) AS height,
        |       duration_ms
        |FROM s ORDER BY media_id""".stripMargin,
    "mm_ahash" ->
      s"""WITH b AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n,
        |         unnest(generate_series(0, octet_length(encode(text)) - 1)) AS idx,
        |         unnest(list_transform(generate_series(1, octet_length(encode(text))),
        |           i -> 16 * (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1)) - 1)
        |              + (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)) - 1))) AS byte
        |  FROM documents),
        |blk AS (SELECT doc_id, n, (idx * $AHashBlocks) // n AS block,
        |          CAST(sum(byte) AS BIGINT) AS bsum, count(*) AS bcnt
        |        FROM b GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, CAST(sum(bsum) AS BIGINT) AS total FROM blk GROUP BY 1),
        |sig AS (SELECT blk.doc_id,
        |          CAST(sum(CASE WHEN CAST(bsum AS HUGEINT) * blk.n
        |                             > CAST(total AS HUGEINT) * bcnt
        |                        THEN (CAST(1 AS BIGINT) << CAST(block AS INT))
        |                        ELSE 0 END) AS BIGINT) AS ahash
        |        FROM blk JOIN tot USING (doc_id) GROUP BY 1),
        |g AS (SELECT ahash, count(*) AS n_sharing FROM sig GROUP BY 1)
        |SELECT doc_id, ahash, n_sharing
        |FROM sig JOIN g USING (ahash)
        |ORDER BY doc_id""".stripMargin,
    "mm_ahash_pairs" ->
      s"""WITH b AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n,
        |         unnest(generate_series(0, octet_length(encode(text)) - 1)) AS idx,
        |         unnest(list_transform(generate_series(1, octet_length(encode(text))),
        |           i -> 16 * (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1)) - 1)
        |              + (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)) - 1))) AS byte
        |  FROM documents),
        |blk AS (SELECT doc_id, n, (idx * $AHashBlocks) // n AS block,
        |          CAST(sum(byte) AS BIGINT) AS bsum, count(*) AS bcnt
        |        FROM b GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, CAST(sum(bsum) AS BIGINT) AS total FROM blk GROUP BY 1),
        |sig AS (SELECT blk.doc_id,
        |          CAST(sum(CASE WHEN CAST(bsum AS HUGEINT) * blk.n
        |                             > CAST(total AS HUGEINT) * bcnt
        |                        THEN (CAST(1 AS BIGINT) << CAST(block AS INT))
        |                        ELSE 0 END) AS BIGINT) AS ahash
        |        FROM blk JOIN tot USING (doc_id) GROUP BY 1),
        |bands AS (
        |  SELECT doc_id, ahash, 0 AS band, ahash % 32 AS bk FROM sig
        |  UNION ALL SELECT doc_id, ahash, 1, (ahash // 32) % 32 FROM sig
        |  UNION ALL SELECT doc_id, ahash, 2, ahash // 1024 FROM sig),
        |kept AS (SELECT band, bk FROM bands GROUP BY 1, 2
        |         HAVING count(*) <= $AHashBandCap),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |           CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        |         FROM bands a
        |         JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
        |         JOIN kept k ON k.band = a.band AND k.bk = a.bk)
        |SELECT doc_a, doc_b, hamming FROM cand
        |WHERE hamming <= $AHashMaxHamming
        |ORDER BY doc_a, doc_b""".stripMargin,
    "mm_binary_stats" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS payload_md5,
        |       md5(substr(text, 1, 64)) AS head_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_feature_topk" ->
      """WITH f AS (SELECT doc_id AS vec_id, md5(text) AS h FROM documents),
        |feats AS (SELECT vec_id, i,
        |            ((strpos('0123456789abcdef', substr(h, i*2+1, 1)) - 1) * 16
        |             + strpos('0123456789abcdef', substr(h, i*2+2, 1)) - 1 - 128) / 128.0 AS x
        |          FROM f, (SELECT unnest(generate_series(0, 7)) AS i) idx),
        |dots AS (SELECT q.vec_id AS q_id, e.vec_id, sum(q.x * e.x) AS dot,
        |                sqrt(sum(q.x * q.x)) AS nq, sqrt(sum(e.x * e.x)) AS nv
        |         FROM feats q JOIN feats e ON q.i = e.i AND e.vec_id <> q.vec_id
        |         WHERE q.vec_id < 5 GROUP BY 1, 2),
        |scored AS (SELECT q_id, vec_id AS media_id, round(dot/(nq*nv), 6) AS cos,
        |                  CAST(row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(dot/(nq*nv), 6) DESC, vec_id) AS BIGINT) AS rnk
        |           FROM dots)
        |SELECT q_id, media_id, cos, rnk FROM scored WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
  )
}
