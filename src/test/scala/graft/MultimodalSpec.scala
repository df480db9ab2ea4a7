package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.fromDocuments(spark, dir)
    val schema = m.schema
    assert(schema("bytes").dataType.typeName === "binary")
    assert(m.count() === 500)
    assert(m.select("kind").distinct().count() === 3)
  }

  test("decode stub streams partition-wise and is deterministic") {
    val m = Multimodal.fromDocuments(spark, dir).repartition(8)
    val f1 = Multimodal.decodeStub(m).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeStub(m).collect().sortBy(_.media_id)
    assert(f1.length === 500)
    assert(f1.map(_.checksum).toSeq === f2.map(_.checksum).toSeq)
    f1.foreach { f =>
      assert(f.features.length === 8)
      f.features.foreach(x => assert(x >= -1.0 && x <= 1.0))
      assert(f.checksum.length === 32)
    }
  }

  test("frame sampler yields every stride-th fixed-size frame, by expression only") {
    val m = Multimodal.fromDocuments(spark, dir).toDF()
    val frames = Multimodal.frameSample(m, frameBytes = 32, stride = 2)
    val one = frames.filter("media_id = 0").orderBy("frame_idx").collect()
    val nBytes = m.filter("media_id = 0").select(length(col("bytes"))).collect()(0).getInt(0)
    val expected = (0 until math.ceil(nBytes / 32.0).toInt).count(_ % 2 == 0)
    assert(one.length === expected)
    assert(one.map(_.getAs[Int]("frame_idx")).forall(_ % 2 == 0))
    // all but possibly the last sampled frame are full-size
    val sizes = one.map(r => r.getAs[Array[Byte]]("frame").length)
    assert(sizes.dropRight(1).forall(_ === 32))
  }

  test("resizeMeta clamps dimensions preserving aspect") {
    val m = Multimodal.fromDocuments(spark, dir).toDF()
    val r = Multimodal.resizeMeta(m, maxDim = 100)
    assert(r.filter("width > 100 or height > 100").count() === 0)
    assert(r.count() === m.count())
    // aspect preservation: both dims scale by the SAME factor
    // (100 / max dim), so the scaled values are derivable from the
    // originals — a per-dimension clamp would fail this
    val before = m.select("media_id", "width", "height").collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2))).toMap
    r.select("media_id", "width", "height").collect().foreach { x =>
      val (w0, h0) = before(x.getLong(0))
      val scale = math.min(1.0, 100.0 / math.max(w0, math.max(h0, 1)))
      assert(x.getInt(1) === (w0 * scale).toInt)
      assert(x.getInt(2) === (h0 * scale).toInt)
    }
  }

  test("media-feature top-k matches a brute-force recomputation of the stub features") {
    val feats = Multimodal.decodeStub(Multimodal.fromDocuments(spark, dir))
      .collect().map(f => f.media_id -> f.features).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (0L until 5L).flatMap { q =>
      feats.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(feats(q), v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(5).zipWithIndex
        .map { case ((id, c), i) => (q, id, c, i + 1L) }
    }.toSet
    val got = Multimodal.mediaFeatureTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  private def pngBytes(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("image payloads REALLY decode: features come from pixel data, not the payload hash") {
    import spark.implicits._
    // 2x2 solid red; 4x1 black-to-white gray ramp
    val red = pngBytes(2, 2)((_, _) => 0xff0000)
    val ramp = pngBytes(4, 1)((x, _) => { val g = x * 85; (g << 16) | (g << 8) | g })
    val media = Seq(
      graft.operators.Multimodal.MediaRecord(1L, "image", red, 2, 2, 0L),
      graft.operators.Multimodal.MediaRecord(2L, "image", ramp, 4, 1, 0L),
      graft.operators.Multimodal.MediaRecord(3L, "audio", red, 0, 0, 10L),
      graft.operators.Multimodal.MediaRecord(4L, "image", "not an image".getBytes, 0, 0, 0L))
      .toDS()
    val got = graft.operators.Multimodal.decode(media).collect()
      .map(f => f.media_id -> f).toMap
    // solid red: meanR=1, meanG=meanB=0, gray=(255+0+0)/3=85 everywhere
    val r = got(1L).features
    assert(r(0) === 1.0 && r(1) === 0.0 && r(2) === 0.0)
    assert(r(3) === 255.0 / (3.0 * 255.0))
    assert(r(4) === 85.0 / 255.0 && r(5) === 85.0 / 255.0)
    assert(r(6) === 2.0 / 4096.0 && r(7) === 2.0 / 4096.0)
    // gray ramp: channel means = (0+85+170+255)/(4*255), extremes 0 and 255
    val g = got(2L).features
    val mean = (0.0 + 85 + 170 + 255) / (4.0 * 255.0)
    assert(g(0) === mean && g(1) === mean && g(2) === mean && g(3) === mean)
    assert(g(4) === 0.0 && g(5) === 1.0)
    assert(g(6) === 4.0 / 4096.0 && g(7) === 1.0 / 4096.0)
    // audio kind and unparseable image both fall back to the MD5 stub
    val stub = graft.operators.Multimodal.decodeStub(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(got(3L).features.toSeq === stub(3L))
    assert(got(4L).features.toSeq === stub(4L))
    // and the real-decoded ones must NOT equal their stub features
    assert(got(1L).features.toSeq !== stub(1L))
  }

  test("decoded image features flow into the generic ANN path") {
    import spark.implicits._
    // 8 images: 4 reddish + 4 bluish clusters; neighbors of a red query
    // must all be reddish
    val media = (0 until 8).map { i =>
      val c = if (i % 2 == 0) 0xd00000 + i * 8 else 0x0000d0 + (i << 16 & 0x0f0000)
      graft.operators.Multimodal.MediaRecord(i.toLong, "image", pngBytes(3, 3)((_, _) => c), 3, 3, 0L)
    }.toDS()
    val feats = graft.operators.Multimodal.decode(media).toDF()
    val top = graft.operators.Similarity
      .cosineTopKOver(feats, "media_id", "features", numQueries = 1, k = 3)
      .collect()
    assert(top.length === 3)
    // query 0 is reddish — its top-3 by cosine must be the other reds
    assert(top.map(_.getLong(1)).toSet === Set(2L, 4L, 6L))
  }

  test("frame sampler emits zero frames for empty payloads") {
    import spark.implicits._
    val m = Seq((1L, "image", Array.empty[Byte], 0, 0, 0L),
        (2L, "image", "abc".getBytes, 0, 0, 0L))
      .toDF("media_id", "kind", "bytes", "width", "height", "duration_ms")
    val frames = graft.operators.Multimodal.frameSample(m, frameBytes = 2, stride = 1)
    assert(frames.filter("media_id = 1").count() === 0)
    assert(frames.filter("media_id = 2").count() === 2)
  }

  test("blockwise aHash equals a driver recompute over the raw bytes") {
    val texts = graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ref(t: String): Long = {
      val bytes = t.getBytes("UTF-8").map(_.toLong & 0xff)
      val n = bytes.length.toLong
      val blocks = bytes.zipWithIndex
        .groupBy { case (_, i) => i.toLong * Multimodal.AHashBlocks / n }
      val total = bytes.sum
      blocks.collect {
        case (b, bs) if BigInt(bs.map(_._1).sum) * n > BigInt(total) * bs.length => 1L << b.toInt
      }.sum
    }
    val expected = texts.view.mapValues(ref).toMap
    val sharing = expected.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Multimodal.aHash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === texts.size)
    got.foreach { case (id, h, ns) =>
      assert(h === expected(id), s"ahash for doc $id")
      assert(ns === sharing(h), s"sharing count for doc $id")
    }
    // the signature is 16-bit-bounded
    got.foreach { case (_, h, _) => assert(h >= 0L && h < 65536L) }
  }

  test("aHashPairs equals a banded driver recompute at hamming <= 2") {
    val texts = graft.engine.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val sigs = texts.map { case (id, t) =>
      id -> Multimodal.aHashOf(t.getBytes("UTF-8")) }
    // replicate the banding exactly: bucket membership, saturation cap,
    // in-bucket pairs, exact hamming verify
    val bands: Seq[((Int, Long), Long, Long)] = sigs.toSeq.flatMap { case (id, h) =>
      Seq((0, h % 32), (1, (h / 32) % 32), (2, h / 1024)).map(b => (b, id, h)) }
    val byBucket = bands.groupBy(_._1)
      .filter(_._2.length <= Multimodal.AHashBandCap)
    val expected = byBucket.values.flatMap { members =>
      members.flatMap { case (_, a, ha) =>
        members.collect {
          case (_, b, hb)
            if a < b && java.lang.Long.bitCount(ha ^ hb) <= Multimodal.AHashMaxHamming =>
            (a, b) -> java.lang.Long.bitCount(ha ^ hb).toLong
        }
      }
    }.toMap
    val got = Multimodal.aHashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.nonEmpty, "exact-dup signatures exist, so pairs must too")
  }

  test("aHash one-pass and posexplode mirror agree on NON-ASCII payloads (byte contract)") {
    import spark.implicits._
    // multi-byte UTF-8: é (2 bytes), € (3), 𝄞 (4) — char-based iteration
    // would count length(text) positions and diverge from the octet walk
    val docs = Seq(
      (1L, "héllo wörld € test", "xx", "t", 18L),
      (2L, "𝄞 music clef " * 3, "xx", "t", 39L),
      (3L, "plain ascii baseline", "xx", "t", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("ahash_nonascii").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fast = Multimodal.aHash(spark, tmp).collect().toSeq
    val mirror = Multimodal.aHashExplode(spark, tmp).collect().toSeq
    assert(fast === mirror)
    // and both equal the driver byte-walk
    val expected = Seq(
      (1L, "héllo wörld € test"), (2L, "𝄞 music clef " * 3),
      (3L, "plain ascii baseline"))
      .map { case (id, t) => id -> Multimodal.aHashOf(t.getBytes("UTF-8")) }.toMap
    fast.foreach(r => assert(r.getLong(1) === expected(r.getLong(0))))
  }

  test("whash bits equal an independent Hadamard matrix-multiply recompute") {
    // independent construction: H(k,j) via explicit parity loop over
    // the AND bits (not Long.bitCount, which whashOf itself uses)
    def parity(x: Int): Int = {
      var p = 0; var v = x
      while (v != 0) { p ^= (v & 1); v >>= 1 }
      p
    }
    def reference(payload: Array[Byte]): Long = {
      val n = payload.length
      val sums = new Array[Long](16); val cnts = new Array[Long](16)
      payload.indices.foreach { i =>
        val b = (i.toLong * 16 / n).toInt
        sums(b) += (payload(i) & 0xff).toLong; cnts(b) += 1L
      }
      val means = (0 until 16).map(j =>
        if (cnts(j) == 0) 0L else sums(j) * 1024L / cnts(j))
      (1 until 16).map { k =>
        val coef = (0 until 16).map(j =>
          if (parity(k & j) == 0) means(j) else -means(j)).sum
        if (coef > 0) 1L << k else 0L
      }.sum
    }
    for (s <- Seq("hello world this is a payload of some length",
        "aaaa", "x", "the quick brown fox jumps over the lazy dog " * 4)) {
      val p = s.getBytes("UTF-8")
      assert(Multimodal.whashOf(p) === reference(p), s"payload: $s")
    }
    // DC bit never set, bits confined to 1..15
    assert((Multimodal.whashOf("abc".getBytes) & 1L) === 0L)
    assert(Multimodal.whashOf("abcdefgh".getBytes) < (1L << 16))
  }

  test("frame energy is zero iff the frame is constant and crossings are bounded") {
    import spark.implicits._
    val rows = Multimodal.frameEnergy(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("energy") >= 0L)
      assert(r.getAs[Long]("crossings") <= math.max(0L, r.getAs[Long]("frame_bytes") - 1L))
      // zero variance forces zero mean-crossings
      if (r.getAs[Long]("energy") === 0L) assert(r.getAs[Long]("crossings") === 0L)
    }
  }

  test("aHash one-pass form equals the posexplode mirror and generates no per-byte rows") {
    val fast = Multimodal.aHash(spark, dir)
    val mirror = Multimodal.aHashExplode(spark, dir)
    assert(fast.collect().toSeq === mirror.collect().toSeq)
    // the production plan must not explode payloads into per-byte rows
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "one-pass aHash must not posexplode")
    assert(mirror.queryExecution.executedPlan.toString.contains("Generate"),
      "mirror keeps the oracle's row-per-byte shape")
  }
}
