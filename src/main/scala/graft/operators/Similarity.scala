package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.Vectors
import graft.plans.ArrayExpressions

/** Similarity search over the `embeddings` table (64-dim float
  * vectors, FIXTURES.md §B): brute-force cosine top-k as the exact
  * baseline, and a sign-bucket LSH variant as the scale path (prune
  * candidates to one bucket before scoring — at 100 TB the bucket join
  * replaces the cross join entirely).
  *
  * Cosine values are rounded to 6 dp before ranking so results are
  * reproducible across engines (double accumulation order differs at
  * the last ulp); ties then break deterministically on vec_id.
  */
object Similarity {

  private val NumQueries = 5
  private val TopK = 5

  /** Default sign-LSH bucket width. 2^bits buckets: more bits → smaller
    * buckets → more parallelism and pruning but lower single-bucket
    * recall. At 100 TB raise the bits (buckets must stay executor-
    * sized) and recover recall with [[lshTopKMultiProbe]]'s hamming-1
    * probing instead of widening buckets. The SparkEntry oracles
    * document the default — callers overriding it diverge from
    * `oracle` by design.
    */
  val LshBucketBits = 8

  private def emb(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings")
      .select($"vec_id", Vectors.toDouble($"embedding").as("emb"))
      .withColumn("nrm", Vectors.norm($"emb"))
  }

  /** (vec_id, emb, nrm, bucket) — the shared prelude for every
    * sign-bucketed consumer (here and the Dedup embedding near-dups):
    * the bucketing and rounding conventions the cross-engine oracles
    * depend on live in exactly one place.
    */
  private[operators] def embWithBucket(spark: SparkSession, dir: String,
      bits: Int): DataFrame = {
    import spark.implicits._
    emb(spark, dir).withColumn("bucket", Vectors.signBucket($"emb", bits))
  }

  /** Exact brute-force cosine top-k over ANY (id, array<double>) frame
    * — the reusable exact path (media features ride through here too).
    * Queries are the rows with id < `numQueries`.
    */
  def cosineTopKOver(e0: DataFrame, idCol: String, embCol: String,
      numQueries: Int = NumQueries, k: Int = TopK): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val e = e0.select(col(idCol).as("vec_id"), col(embCol).as("emb"))
      .withColumn("nrm", Vectors.norm($"emb"))
    val q = e.filter($"vec_id" < numQueries)
      .select($"vec_id".as("q_id"), $"emb".as("qe"), $"nrm".as("nq"))
    q.join(e, $"vec_id" =!= $"q_id")
      // native codegen'd dot (bit-identical to Vectors.dot — see
      // ArrayExpressionsSpec) for the q×n hot loop
      .withColumn("cos", round(ArrayExpressions.dot($"qe", $"emb") / ($"nq" * $"nrm"), 6))
      .withColumn("rnk",
        row_number().over(Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id"))
          .cast("long"))
      .filter($"rnk" <= k)
      .select($"q_id", $"vec_id", $"cos", $"rnk")
      .orderBy($"q_id", $"rnk")
  }

  /** Exact brute-force cosine top-k for the first `NumQueries` vectors. */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cosineTopKOver(
      Tables.load(spark, dir, "embeddings")
        .select($"vec_id", Vectors.toDouble($"embedding").as("emb")),
      "vec_id", "emb")
  }

  /** LSH-bucketed ANN: candidates restricted to the query's sign
    * bucket (first `bits` dims), then exact cosine within the bucket.
    */
  def lshTopK(spark: SparkSession, dir: String,
      bits: Int = LshBucketBits): DataFrame = {
    import spark.implicits._
    val e = embWithBucket(spark, dir, bits)
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("q_id"), $"emb".as("qe"), $"nrm".as("nq"), $"bucket")
    q.join(e, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", round(ArrayExpressions.dot($"qe", $"emb") / ($"nq" * $"nrm"), 6))
      .withColumn("rnk",
        row_number().over(Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id"))
          .cast("long"))
      .filter($"rnk" <= TopK)
      .select($"q_id", $"bucket", $"vec_id", $"cos", $"rnk")
      .orderBy($"q_id", $"rnk")
  }

  /** Multi-probe LSH ANN: each query probes its own sign bucket PLUS
    * every bucket at hamming distance 1 (one flipped bit) — `bits`+1
    * probe keys per query. A data vector lives in exactly one bucket,
    * so probes never duplicate a candidate; recall lost to a borderline
    * sign (the common near-neighbor failure: one dimension near 0
    * flips) is recovered without enlarging any bucket. This is the
    * scale recipe: raise `bits` to keep buckets small, multi-probe to
    * keep recall.
    */
  def lshTopKMultiProbe(spark: SparkSession, dir: String,
      bits: Int = LshBucketBits): DataFrame = {
    import spark.implicits._
    val e = embWithBucket(spark, dir, bits)
    val q = e.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("q_id"), $"emb".as("qe"), $"nrm".as("nq"),
        explode(Vectors.probeBuckets($"bucket", bits)).as("bucket"))
    q.join(e, Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", round(ArrayExpressions.dot($"qe", $"emb") / ($"nq" * $"nrm"), 6))
      .withColumn("rnk",
        row_number().over(Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id"))
          .cast("long"))
      .filter($"rnk" <= TopK)
      .select($"q_id", $"vec_id", $"cos", $"rnk")
      .orderBy($"q_id", $"rnk")
  }

  /** IVF list count / probe fan-out. Centroids here are a deterministic
    * sample (the first `IvfNumCentroids` vectors) so the oracle can
    * reproduce the assignment; a production deployment trains them
    * (k-means) offline and broadcasts the same way.
    */
  val IvfNumCentroids = 8
  val IvfNProbe = 2

  /** IVF-style ANN: assign every vector to its nearest centroid
    * (broadcast centroid table, map-side argmax — an embarrassingly
    * parallel projection), then each query scores only the `nProbe`
    * inverted lists nearest to it. This is the second scale path next
    * to sign-LSH: candidate volume ≈ nProbe/numCentroids of the corpus,
    * and the candidate join distributes on cent_id — list-partitioned,
    * exactly how a 1000-executor IVF shards. Ties and floats are pinned
    * the usual way (cosines rounded to 6 dp, ranks break on id).
    */
  def ivfTopK(spark: SparkSession, dir: String,
      numCentroids: Int = IvfNumCentroids, nProbe: Int = IvfNProbe): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir)
    val cents = e.filter($"vec_id" < numCentroids)
      .select($"vec_id".as("cent_id"), $"emb".as("cemb"), $"nrm".as("cnrm"))
    val ranked = e.crossJoin(broadcast(cents))
      .withColumn("csim",
        round(ArrayExpressions.dot($"emb", $"cemb") / ($"nrm" * $"cnrm"), 6))
      .withColumn("crnk",
        row_number().over(Window.partitionBy($"vec_id").orderBy($"csim".desc, $"cent_id"))
          .cast("long"))
    val assign = ranked.filter($"crnk" === 1)
      .select($"vec_id", $"emb", $"nrm", $"cent_id")
    val probes = ranked.filter($"vec_id" < NumQueries && $"crnk" <= nProbe)
      .select($"vec_id".as("q_id"), $"emb".as("qe"), $"nrm".as("nq"), $"cent_id")
    // ≤ queries × nProbe rows — broadcast, or Catalyst sort-merges the
    // whole assignment relation against it
    broadcast(probes).join(assign, Seq("cent_id"))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", round(ArrayExpressions.dot($"qe", $"emb") / ($"nq" * $"nrm"), 6))
      .withColumn("rnk",
        row_number().over(Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id"))
          .cast("long"))
      .filter($"rnk" <= TopK)
      .select($"q_id", $"vec_id", $"cos", $"rnk")
      .orderBy($"q_id", $"rnk")
  }

  /** Per-dimension int8-style quantization of the embedding corpus —
    * the storage-compression pass an ANN index runs before serving
    * (scalar quantization: 4× smaller than float32, 8× than float64).
    * Dimension ranges come from one tiny aggregate (posexplode →
    * per-dim min/max → 64 rows) broadcast back; codes are
    * `floor((x − mn) · 255 / (mx − mn))` clamped to 255 — floor, NOT
    * round (round's half-up vs half-even differs across engines), all
    * arithmetic in double after an exact float→double widening, so
    * codes are bit-identical anywhere. Output is the unnested
    * (vec_id, dim, code) relation.
    */
  def quantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dims = Tables.load(spark, dir, "embeddings")
      .select(posexplode(Vectors.toDouble($"embedding")).as(Seq("dim", "x")))
      .groupBy($"dim")
      .agg(min($"x").as("mn"), max($"x").as("mx"))
    Tables.load(spark, dir, "embeddings")
      .select($"vec_id", posexplode(Vectors.toDouble($"embedding")).as(Seq("dim", "x")))
      .join(broadcast(dims), Seq("dim"))
      .select($"vec_id", $"dim".cast("long").as("dim"),
        when($"mx" === $"mn", lit(0L))
          .otherwise(least(floor(($"x" - $"mn") * 255.0 / ($"mx" - $"mn")), lit(255.0))
            .cast("long")).as("code"))
      .orderBy($"vec_id", $"dim")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_quantize" -> quantize _,
    "ann_cosine_topk" -> cosineTopK _,
    "ann_lsh_topk" -> ((s: SparkSession, d: String) => lshTopK(s, d)),
    "ann_lsh_multiprobe" -> ((s: SparkSession, d: String) => lshTopKMultiProbe(s, d)),
    "ann_ivf_topk" -> ((s: SparkSession, d: String) => ivfTopK(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "emb_quantize" ->
      """WITH d AS (
        |  SELECT i - 1 AS dim,
        |         min(CAST(embedding[i] AS DOUBLE)) AS mn,
        |         max(CAST(embedding[i] AS DOUBLE)) AS mx
        |  FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
        |  GROUP BY 1)
        |SELECT vec_id, d.dim,
        |       CASE WHEN mx = mn THEN 0
        |            ELSE CAST(least(floor((CAST(embedding[d.dim + 1] AS DOUBLE) - mn) * 255.0
        |                                  / (mx - mn)), 255.0) AS BIGINT) END AS code
        |FROM embeddings CROSS JOIN d
        |ORDER BY vec_id, dim""".stripMargin,
    "ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |pairs AS (SELECT q_id, e.vec_id, qe, e.embedding AS ve
        |          FROM q, embeddings e WHERE e.vec_id <> q_id),
        |flat AS (SELECT q_id, vec_id, CAST(unnest(qe) AS DOUBLE) AS x,
        |                CAST(unnest(ve) AS DOUBLE) AS y FROM pairs),
        |dots AS (SELECT q_id, vec_id, sum(x*y) AS dot,
        |                sqrt(sum(x*x)) AS nq, sqrt(sum(y*y)) AS nv
        |         FROM flat GROUP BY 1, 2),
        |scored AS (SELECT q_id, vec_id, round(dot/(nq*nv), 6) AS cos,
        |                  CAST(row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(dot/(nq*nv), 6) DESC, vec_id) AS BIGINT) AS rnk
        |           FROM dots)
        |SELECT q_id, vec_id, cos, rnk FROM scored WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    "ann_lsh_topk" ->
      """WITH b AS (SELECT vec_id, embedding,
        |             array_to_string(list_transform(embedding[1:8],
        |               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
        |           FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS qe, bucket FROM b WHERE vec_id < 5),
        |pairs AS (SELECT q.q_id, q.bucket, e.vec_id, q.qe, e.embedding AS ve
        |          FROM q JOIN b e ON q.bucket = e.bucket AND e.vec_id <> q.q_id),
        |flat AS (SELECT q_id, bucket, vec_id, CAST(unnest(qe) AS DOUBLE) AS x,
        |                CAST(unnest(ve) AS DOUBLE) AS y FROM pairs),
        |dots AS (SELECT q_id, bucket, vec_id, sum(x*y) AS dot,
        |                sqrt(sum(x*x)) AS nq, sqrt(sum(y*y)) AS nv
        |         FROM flat GROUP BY 1, 2, 3),
        |scored AS (SELECT q_id, bucket, vec_id, round(dot/(nq*nv), 6) AS cos,
        |                  CAST(row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(dot/(nq*nv), 6) DESC, vec_id) AS BIGINT) AS rnk
        |           FROM dots)
        |SELECT q_id, bucket, vec_id, cos, rnk FROM scored WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    "ann_lsh_multiprobe" ->
      """WITH b AS (SELECT vec_id, embedding,
        |             array_to_string(list_transform(embedding[1:8],
        |               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
        |           FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS qe, bucket FROM b WHERE vec_id < 5),
        |probes AS (SELECT q_id, qe,
        |             CASE WHEN i = 0 THEN bucket
        |                  ELSE substr(bucket, 1, i - 1)
        |                    || (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END)
        |                    || substr(bucket, i + 1) END AS bucket
        |           FROM q, (SELECT unnest(generate_series(0, 8)) AS i)),
        |pairs AS (SELECT p.q_id, e.vec_id, p.qe, e.embedding AS ve
        |          FROM probes p JOIN b e ON p.bucket = e.bucket AND e.vec_id <> p.q_id),
        |flat AS (SELECT q_id, vec_id, CAST(unnest(qe) AS DOUBLE) AS x,
        |                CAST(unnest(ve) AS DOUBLE) AS y FROM pairs),
        |dots AS (SELECT q_id, vec_id, sum(x*y) AS dot,
        |                sqrt(sum(x*x)) AS nq, sqrt(sum(y*y)) AS nv
        |         FROM flat GROUP BY 1, 2),
        |scored AS (SELECT q_id, vec_id, round(dot/(nq*nv), 6) AS cos,
        |                  CAST(row_number() OVER (PARTITION BY q_id
        |                       ORDER BY round(dot/(nq*nv), 6) DESC, vec_id) AS BIGINT) AS rnk
        |           FROM dots)
        |SELECT q_id, vec_id, cos, rnk FROM scored WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
    "ann_ivf_topk" ->
      """WITH c AS (SELECT vec_id AS cent_id, embedding AS cemb FROM embeddings WHERE vec_id < 8),
        |cf AS (SELECT e.vec_id, c.cent_id, CAST(unnest(e.embedding) AS DOUBLE) AS x,
        |              CAST(unnest(c.cemb) AS DOUBLE) AS y FROM embeddings e, c),
        |cd AS (SELECT vec_id, cent_id,
        |              round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS csim
        |       FROM cf GROUP BY 1, 2),
        |ranked AS (SELECT vec_id, cent_id,
        |                  CAST(row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY csim DESC, cent_id) AS BIGINT) AS crnk
        |           FROM cd),
        |assign AS (SELECT vec_id, cent_id FROM ranked WHERE crnk = 1),
        |probes AS (SELECT vec_id AS q_id, cent_id FROM ranked WHERE vec_id < 5 AND crnk <= 2),
        |cand AS (SELECT p.q_id, a.vec_id FROM probes p
        |         JOIN assign a ON p.cent_id = a.cent_id AND a.vec_id <> p.q_id),
        |pf AS (SELECT cand.q_id, cand.vec_id, CAST(unnest(q.embedding) AS DOUBLE) AS x,
        |              CAST(unnest(v.embedding) AS DOUBLE) AS y
        |       FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
        |                 JOIN embeddings v ON v.vec_id = cand.vec_id),
        |pd AS (SELECT q_id, vec_id,
        |              round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS cos
        |       FROM pf GROUP BY 1, 2),
        |scored AS (SELECT q_id, vec_id, cos,
        |                  CAST(row_number() OVER (PARTITION BY q_id
        |                       ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
        |           FROM pd)
        |SELECT q_id, vec_id, cos, rnk FROM scored WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
  )
}
