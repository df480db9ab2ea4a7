package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.plans.{ArrayExpressions, GraftExtensions}

class ArrayExpressionsSpec extends SparkSpec {

  test("codegen dot product matches the higher-order-function dot bit for bit") {
    import spark.implicits._
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", Vectors.toDouble($"embedding").as("emb"))
    val both = e.as("a").crossJoin(e.as("b")).limit(2000)
      .select(
        Vectors.dot(col("a.emb"), col("b.emb")).as("hof"),
        ArrayExpressions.dot(col("a.emb"), col("b.emb")).as("native"))
    assert(both.filter($"hof" =!= $"native").count() === 0)
    // null-safety: `=!=` is null-blind, so a regression to null on
    // either side would otherwise pass the comparison above
    assert(both.filter($"hof".isNull || $"native".isNull).count() === 0)
    assert(both.count() === 2000)
  }

  test("codegen hamming distance counts differing bits") {
    import spark.implicits._
    val df = Seq((0L, 0L), (0L, 1L), (0L, 255L), (Long.MaxValue, 0L), (-1L, 0L))
      .toDF("x", "y")
      .select(ArrayExpressions.hamming64(col("x"), col("y")).as("d"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L, 1L, 8L, 63L, 64L))
  }

  test("extensions register graft_dot / graft_hamming64 / graft_simhash64 as SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_hamming64(5L, 6L) AS h, " +
        "graft_simhash64(array('a b c')).hi AS s").collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === 2L)
    assert(r.getLong(2) >= 0L && r.getLong(2) < (1L << 32))
  }

  test("native simhash kernel matches the higher-order-function fold bit for bit") {
    val native = graft.operators.Dedup.simhash(spark, "/root/testdata/sf0.001")
      .collect().toSeq.map(_.toSeq)
    val hof = graft.operators.Dedup.simhashSignaturesHof(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(native.nonEmpty)
    assert(native === hof)
  }

  test("native minhash kernel matches the aggregate signature form bit for bit") {
    val native = graft.operators.Dedup.signatures(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").collect().toSeq.map(r => (r.getLong(0), r.getSeq[String](1)))
    val agg = graft.operators.Dedup.signaturesHof(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").collect().toSeq.map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(native.nonEmpty)
    assert(native === agg)
  }

  test("minhash kernel yields null for an empty feature array") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_minhash16(CAST(array() AS ARRAY<STRING>)) AS a, " +
        "graft_minhash16(array('x y z')) AS b, " +
        "graft_minhash16(array(CAST(NULL AS STRING))) AS c")
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getSeq[String](1).length === 16)
    // all-null features must yield null, never an array of null elements
    assert(r.isNullAt(2))
  }

  test("native winnow kernel matches the HOF chain bit for bit on corpus and edges") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the whole fixture corpus
    val docs = graft.engine.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    assert(rows(graft.operators.TextAnalysis.winnowOf(docs))
      === rows(graft.operators.TextAnalysis.winnowOfHof(docs)))
    // window-clipping edges: 3..8 tokens spans |hs| = 1..6 (short
    // single-window cases and the first multi-window sizes), plus
    // repeated tokens exercising the distinct
    val edges = (3 to 8).map { k =>
      (k.toLong, (1 to k).map(i => s"w${i % 3}").mkString(" "))
    } :+ (99L, "a a a a a a a a a a")
    val edf = edges.toDF("doc_id", "text")
    val native = rows(graft.operators.TextAnalysis.winnowOf(edf))
    assert(native === rows(graft.operators.TextAnalysis.winnowOfHof(edf)))
    assert(native.nonEmpty)
    // under-3-token arrays yield null (callers filter; the kernel must
    // not emit phantom fingerprints)
    val nul = spark.sql("SELECT graft_winnow(array('a', 'b')) AS f").collect()(0)
    assert(nul.isNullAt(0))
  }

  test("native char-counts kernel matches the exploded form bit for bit") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    // the full fixture: the surfaced query vs its exploded twin
    val dir = "/root/testdata/sf0.001"
    assert(rows(graft.operators.TextAnalysis.charDiversity(spark, dir))
      === rows(graft.operators.TextAnalysis.charDiversityExploded(spark, dir)))
    // edge strings directly against a driver recompute: repeats,
    // single char, multi-byte code points (substr semantics are
    // code-point addressed — the kernel must group identically)
    val edge = Seq("aaaa", "a", "abab", "héllo wörld", "日本語 テスト 日本",
      "x y z x y z x")
    val got = edge.toDF("text")
      .select(graft.plans.ArrayExpressions.charCounts($"text").as("c"))
      .select($"c.n_chars", $"c.n_distinct", $"c.ss")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = edge.map { s =>
      val cps = s.codePoints().toArray.toSeq
      val byCp = cps.groupBy(identity).view.mapValues(_.size.toLong)
      (cps.size.toLong, byCp.size.toLong, byCp.values.map(c => c * c).sum)
    }
    assert(got.toSeq === want)
  }
}
