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

  test("frame sampler emits zero frames for empty payloads") {
    import spark.implicits._
    val m = Seq((1L, "image", Array.empty[Byte], 0, 0, 0L),
        (2L, "image", "abc".getBytes, 0, 0, 0L))
      .toDF("media_id", "kind", "bytes", "width", "height", "duration_ms")
    val frames = graft.operators.Multimodal.frameSample(m, frameBytes = 2, stride = 1)
    assert(frames.filter("media_id = 1").count() === 0)
    assert(frames.filter("media_id = 2").count() === 2)
  }
}
