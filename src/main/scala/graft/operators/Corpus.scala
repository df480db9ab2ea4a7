package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Corpus-management operators — the bookkeeping half of a training-data
  * pipeline (builder brief; SURVEY §7.4 extension surface): deterministic
  * sampling, train/val/test split assignment, token-budget batch packing,
  * and benchmark-contamination detection.
  *
  * Everything keys on CONTENT HASHES, never on randomness: a pipeline
  * rerun (or a different engine — the DuckDB oracle) must produce the
  * same sample, the same split, the same contamination list. The shared
  * hash bucket is the first 4 hex chars of md5(text) read as an
  * integer, identical arithmetic on both engines.
  */
object Corpus {

  /** 1-in-SampleK deterministic sample. */
  val SampleK = 10

  /** Split fractions: bucket < 80 → train, < 90 → val, else test. */
  val TrainPct = 80
  val ValPct = 90

  /** Token budget per packed batch. */
  val PackBudget = 512

  /** Benchmark stand-in: every BenchMod-th document. */
  val BenchMod = 50

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** 16-bit content-hash bucket (first 4 hex chars of md5(text)). */
  private val hashBucket =
    expr("CAST(conv(substr(md5(text), 1, 4), 16, 10) AS BIGINT)")

  /** Deterministic 1-in-k sampling by content hash: rerun-stable,
    * engine-independent, and unbiased for hash-uniform content —
    * the property `rand()`-based sampling cannot give a pipeline
    * that must be resumable and auditable.
    */
  def sample(spark: SparkSession, dir: String, k: Int = SampleK): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id", md5($"text").as("fingerprint"), hashBucket.as("hb"))
      .filter($"hb" % k === 0)
      .select($"doc_id", $"fingerprint")
      .orderBy($"doc_id")
  }

  /** Train/val/test assignment from the same content-hash bucket:
    * content-keyed (an exact duplicate always lands in the same split
    * — no train/test leakage from dups), stable across reruns and
    * corpus growth.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    splitAssignOf(docs(spark, dir))

  /** [[splitAssign]] over an arbitrary frame with `doc_id, text` —
    * per-doc the assignment is a pure content function, so running it
    * on a pipeline's survivor set gives each doc the same split it
    * would get from the full corpus (no leakage when stages reorder).
    */
  def splitAssignOf(d: DataFrame): DataFrame = {
    import d.sparkSession.implicits._
    d.select($"doc_id", (hashBucket % 100).as("bucket"))
      .withColumn("split",
        when($"bucket" < TrainPct, "train")
          .when($"bucket" < ValPct, "val")
          .otherwise("test"))
      .orderBy($"doc_id")
  }

  /** Pluggable token counters for [[packBatches]] — both exact integer
    * expressions over `text`, so either is oracle-replayable:
    * whitespace words (the r1 form) and the byte-pair-encoding proxy
    * ⌈bytes/4⌉ (the standard ~4-chars-per-token heuristic), which
    * tracks model-tokenizer budgets without shipping a tokenizer. A
    * deployment with a real tokenizer passes its own count column to
    * [[packBatchesOf]] — packing never looks at `text` itself.
    */
  def whitespaceTokens: Column = size(split(col("text"), " ")).cast("long")
  def bpeProxyTokens: Column = expr("(octet_length(text) + 3) div 4")

  /** Token-budget batch packing per language: contiguous fill in
    * doc_id order, batch = exclusive-prefix-tokens div budget (a doc
    * may straddle a boundary — the deterministic approximation of
    * greedy packing; exact bin-packing is order-dependent anyway).
    * `tokens` plugs in the counter the batch budget is denominated in
    * ([[whitespaceTokens]] | [[bpeProxyTokens]] | a real tokenizer's
    * precomputed column).
    */
  def packBatches(spark: SparkSession, dir: String,
      budget: Int = PackBudget,
      tokens: Column = whitespaceTokens): DataFrame = {
    import spark.implicits._
    packBatchesOf(docs(spark, dir)
      .select($"doc_id", $"lang", tokens.as("n_tokens")), budget)
  }

  /** [[packBatches]] over an arbitrary `(doc_id, lang, n_tokens)`
    * frame — the form a pipeline calls on its SURVIVOR set, so batch
    * ids count only documents that are actually packed.
    *
    * `lang` has a handful of distinct values, so a cumulative window
    * partitioned by lang alone would sort an entire language's corpus
    * in one task. This is instead the classic two-pass distributed
    * prefix sum (the `Ranking.globalRowNumber` scheme):
    *
    *  1. bucket rows by fixed doc_id quantile literals (approximation
    *     error only unbalances buckets — the boundaries are the same
    *     pure expression in every pass, so correctness is unaffected);
    *  2. per-(lang, bucket) token totals → cumulative offsets. That
    *     aggregate is `langs × buckets` rows — metadata, not data — so
    *     its lang-partitioned window is bounded by configuration;
    *  3. broadcast the offsets back; each task prefix-sums only its
    *     own (lang, bucket) slice and shifts by the bucket offset.
    *
    * No window ever consumes raw document rows partitioned by lang
    * alone; the per-task sort is one bucket of one language.
    */
  def packBatchesOf(d: DataFrame, budget: Int = PackBudget,
      buckets: Int = 32): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else d.stat.approxQuantile("doc_id", probes, 0.001).distinct.sorted
    val id = $"doc_id".cast("double")
    val bucketExpr =
      if (bounds.isEmpty) lit(0)
      else {
        val boundsArr = array(bounds.toIndexedSeq.map(lit(_)): _*)
        size(filter(boundsArr, b => b < id))
      }
    val bucketed = d.withColumn("__bucket", bucketExpr)
    // pass 2: per-(lang, bucket) totals, then each bucket's exclusive
    // prefix within its language — a window over the tiny aggregate
    val offW = Window.partitionBy($"lang").orderBy($"__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy($"lang", $"__bucket")
      .agg(sum($"n_tokens").as("__tot"))
      .withColumn("__off", coalesce(sum($"__tot").over(offW), lit(0L)))
      .select($"lang", $"__bucket", $"__off")
    // pass 3: bucket-local exclusive prefix + broadcast offset; `div`
    // keeps the batch id exact integer arithmetic at any token total
    val localW = Window.partitionBy($"lang", $"__bucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("__local", coalesce(sum($"n_tokens").over(localW), lit(0L)))
      .join(broadcast(offsets), Seq("lang", "__bucket"))
      .withColumn("batch", expr(s"(__off + __local) div ${budget}L"))
      .select($"doc_id", $"lang", $"n_tokens", $"batch")
      .orderBy($"doc_id")
  }

  /** Batch-fill audit over [[packBatches]] — the packing-quality
    * report (systematic under-fill means the budget or the token
    * counter is mis-set): per (lang, batch) the doc count, token
    * total, and exact-ppm fill against the budget. One keyed aggregate
    * over the packing output; the batch key is data-scaled.
    */
  def batchStats(spark: SparkSession, dir: String,
      budget: Int = PackBudget): DataFrame = {
    import spark.implicits._
    packBatches(spark, dir, budget)
      .groupBy($"lang", $"batch")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
      .withColumn("fill_ppm",
        expr(s"CAST(n_tokens AS DECIMAL(19,0)) * 1000000 div ${budget}L"))
      .orderBy($"lang", $"batch")
  }

  /** Benchmark-contamination detection (the decontamination pass every
    * eval-honest pipeline runs): flag training documents whose 5-token
    * head fingerprint collides with a held-out benchmark set — here
    * the deterministic stand-in "every [[BenchMod]]-th doc". The
    * benchmark fingerprint set is small → broadcast semi-join; at real
    * scale this is exactly how a 13-gram bloom/semi-join decontam pass
    * distributes.
    */
  def contamination(spark: SparkSession, dir: String,
      benchMod: Int = BenchMod): DataFrame = {
    import spark.implicits._
    val f = docs(spark, dir)
      .select($"doc_id", TextAnalysis.headMd5(split($"text", " ")).as("head_md5"))
    val bench = f.filter($"doc_id" % benchMod === 0).select($"head_md5")
    f.filter($"doc_id" % benchMod =!= 0)
      .join(broadcast(bench), Seq("head_md5"), "left_semi")
      .select($"doc_id", $"head_md5")
      .orderBy($"doc_id")
  }

  /** Stratified (language-rebalanced) deterministic downsample: every
    * language is thinned to ≈ the smallest language's document count.
    * A doc survives iff `hb * cnt_lang < min_cnt * 65536` — pure
    * integer arithmetic on the content-hash bucket, so the kept set is
    * rerun-stable, engine-exact, and content-keyed like [[sample]].
    * Language counts are a tiny aggregate → broadcast joins; the
    * filter itself is map-side, no extra shuffle over the corpus.
    */
  def stratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir).select($"doc_id", $"lang", hashBucket.as("hb"))
    val counts = d.groupBy($"lang").agg(count(lit(1)).as("cnt"))
    val mn = counts.agg(min($"cnt").as("mn"))
    d.join(broadcast(counts), "lang")
      .crossJoin(broadcast(mn))
      .filter($"hb" * $"cnt" < $"mn" * lit(65536L))
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** Weight cap and base rate for [[weightedSample]], shared with the
    * oracle.
    */
  val WeightCap = 100L
  val WeightRateNum = 1L
  val WeightRateDen = 4L

  /** IMPORTANCE-weighted deterministic sampling — the data-mixing verb
    * quality-upsampling pipelines run: each document survives with
    * probability `(rate) · weight/cap`, where the weight here is its
    * token count capped at [[WeightCap]] (longer docs carry more
    * training signal; any integer quality score plugs into the same
    * inequality). The decision is pure integer arithmetic on the
    * content hash — keep ⇔ h·cap·rate_den < 2¹⁶·w·rate_num — so the
    * kept set is rerun-stable, engine-exact, unbiased for
    * hash-uniform content, and needs no rand() and no doubles
    * (the [[stratified]] inequality with a per-ROW numerator).
    * Map-only: a projection and a filter, no shuffle at any scale.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id",
        least(size(split($"text", " ")).cast("long"), lit(WeightCap)).as("weight"),
        hashBucket.as("hb"))
      .filter($"hb" * WeightCap * WeightRateDen < lit(65536L) * $"weight" * WeightRateNum)
      .select($"doc_id", $"weight")
      .orderBy($"doc_id")
  }

  /** Mixing recipe for [[epochs]]: per-source repeat factor as
    * (whole epochs, fractional-tail numerator out of 2¹⁶). src0 runs
    * 2.5 epochs, src1 exactly 3, src2 is DOWN-sampled to 0.75, src3
    * 1.25; every unlisted source runs exactly [[EpochDefault]] epoch.
    * A production recipe swaps this literal table for its own — the
    * expansion below never changes shape.
    */
  val EpochRecipe: Seq[(String, Int, Int)] = Seq(
    ("src0", 2, 32768),
    ("src1", 3, 0),
    ("src2", 0, 49152),
    ("src3", 1, 16384))
  val EpochDefault: (Int, Int) = (1, 0)

  /** Epoch-weighted mixture EXPANSION — [[mix]] reports the recipe's
    * inputs, this APPLIES one: the upsampled corpus listing where each
    * document appears `whole + (hb < frac ? 1 : 0)` times per its
    * source's [[EpochRecipe]] factor. Whole epochs repeat every doc;
    * the fractional tail keeps a content-hash-thresholded slice — the
    * same deterministic inequality as [[weightedSample]], so the
    * expansion is rerun-stable, engine-exact, rand()-free, and a doc's
    * fate never depends on partitioning. Downsampling (factor < 1) is
    * the same formula with zero whole epochs. Shape: a broadcast-sized
    * CASE over `source`, a filter, and one in-row `posexplode` of at
    * most `whole+1` copies — map-only at any scale; `copy` indexes
    * repeats so a downstream [[shuffleOrder]] can interleave epochs.
    */
  def epochs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val whole = EpochRecipe.foldLeft(
      when(lit(false), lit(0))) { case (acc, (s, w, _)) =>
        acc.when($"source" === s, lit(w)) }
      .otherwise(lit(EpochDefault._1))
    val frac = EpochRecipe.foldLeft(
      when(lit(false), lit(0))) { case (acc, (s, _, f)) =>
        acc.when($"source" === s, lit(f)) }
      .otherwise(lit(EpochDefault._2))
    docs(spark, dir)
      .select($"doc_id", $"source", hashBucket.as("hb"))
      .withColumn("n_copies",
        (whole + when($"hb" < frac, 1).otherwise(0)).cast("long"))
      .filter($"n_copies" > 0)
      .select($"doc_id", $"source",
        posexplode(expr("sequence(CAST(1 AS BIGINT), n_copies)")).as(Seq("__i", "copy")))
      .select($"doc_id", $"source", $"copy")
      .orderBy($"doc_id", $"copy")
  }

  /** Snapshot diff — the audit verb between two corpus versions (the
    * companion to incremental dedup: what changed since the last crawl
    * / pipeline run?): every doc_id is classified `added` (new only),
    * `removed` (old only) or `changed` (present in both, content hash
    * differs); unchanged documents are dropped. Content identity is
    * md5(text) computed map-side; the classification is ONE
    * doc_id-keyed full outer join — co-partitioned sort-merge at any
    * scale, no window, no driver state.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = oldDf.select(col("doc_id"), md5(col("text")).as("__old_md5"))
    val n = newDf.select(col("doc_id"), md5(col("text")).as("__new_md5"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("__old_md5").isNull, "added")
          .when(col("__new_md5").isNull, "removed")
          .when(col("__old_md5") =!= col("__new_md5"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"))
      .orderBy(col("doc_id"))
  }

  /** Replayable snapshot pair for the surfaced [[snapshotDiff]] query:
    * "old" is the corpus minus every 11th doc (those become `added`),
    * "new" is the corpus minus every 13th (`removed`) with every 7th
    * doc's text amended (`changed`) — pure doc_id arithmetic, so the
    * oracle rebuilds both snapshots exactly.
    */
  def snapshotDiffHalves(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir).select($"doc_id", $"text")
    snapshotDiff(
      d.filter($"doc_id" % 11 =!= 0),
      d.filter($"doc_id" % 13 =!= 0)
        .select($"doc_id",
          when($"doc_id" % 7 === 0, concat($"text", lit(" v2")))
            .otherwise($"text").as("text")))
  }

  /** Per-cell corpus MANIFEST — the reproducibility digest two
    * pipeline runs (or two replicas) compare instead of diffing 100 TB
    * row-by-row: per (source, lang) the doc count, token count, and an
    * ORDER-INDEPENDENT content digest (the sum of each doc's 60-bit
    * content key — any added, removed or changed document flips the
    * cell's digest; commutative, so partitioning and arrival order
    * never matter). One keyed aggregate with map-side partials; the
    * digest sums 60-bit keys as DECIMAL so 10¹² docs per cell stay
    * exact, then reduces the sum mod 2⁶¹ into a BIGINT — a raw
    * DECIMAL(38,0) digest shipped red in r6 because one cell's sum
    * exceeded int64 and could not round-trip an int64-coercing reader
    * (no DECIMAL(38,0) column may cross the hashed contract). The mod
    * keeps both properties that matter: commutative, and any changed
    * document still flips the cell (a collision needs the per-doc key
    * deltas to cancel mod 2⁶¹). [[snapshotDiff]] is the row-level
    * drill-down once a cell's digest disagrees.
    */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    manifestOf(docs(spark, dir))

  /** [[manifest]] over an arbitrary `(source, lang, text)` frame. */
  def manifestOf(d: DataFrame): DataFrame = {
    import d.sparkSession.implicits._
    d.select($"source", $"lang",
        size(split($"text", " ")).cast("long").as("tok"),
        expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS DECIMAL(19,0))").as("k"))
      .groupBy($"source", $"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"tok").as("n_tokens"),
        expr("CAST(CAST(sum(k) AS DECIMAL(38,0)) % 2305843009213693952 AS BIGINT)").as("digest_61"))
      .orderBy($"source", $"lang")
  }

  /** CELL-level snapshot comparison — what two pipeline runs actually
    * diff FIRST: the per-(source, lang) manifests of two corpus
    * versions, full-outer-joined, each cell classified `added` /
    * `removed` / `changed` (any of count, token sum, or digest moved);
    * identical cells are dropped. This is the cheap triage layer above
    * [[snapshotDiff]]: two manifest-sized relations join instead of
    * two corpora, and only flagged cells pay for the row-level
    * drill-down. One join keyed on the (bounded) cell key.
    */
  def manifestDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = manifestOf(oldDf).select(
      col("source"), col("lang"), col("n_docs").as("n_docs_old"),
      col("n_tokens").as("n_tokens_old"), col("digest_61").as("digest_old"))
    val n = manifestOf(newDf).select(
      col("source"), col("lang"), col("n_docs").as("n_docs_new"),
      col("n_tokens").as("n_tokens_new"), col("digest_61").as("digest_new"))
    o.join(n, Seq("source", "lang"), "full_outer")
      .withColumn("status",
        when(col("digest_old").isNull, "added")
          .when(col("digest_new").isNull, "removed")
          .when(col("digest_old") =!= col("digest_new")
            || col("n_docs_old") =!= col("n_docs_new")
            || col("n_tokens_old") =!= col("n_tokens_new"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("source"), col("lang"), col("status"),
        coalesce(col("n_docs_old"), lit(0L)).as("n_docs_old"),
        coalesce(col("n_docs_new"), lit(0L)).as("n_docs_new"))
      .orderBy(col("source"), col("lang"))
  }

  /** [[manifestDiff]] over the same synthesized halves as
    * [[snapshotDiffHalves]] (old = doc_id∤11, new = doc_id∤13 with
    * every 7th doc edited) — the oracle-checkable instantiation.
    */
  def manifestDiffHalves(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir).select($"doc_id", $"source", $"lang", $"text")
    manifestDiff(
      d.filter($"doc_id" % 11 =!= 0),
      d.filter($"doc_id" % 13 =!= 0)
        .select($"doc_id", $"source", $"lang",
          when($"doc_id" % 7 === 0, concat($"text", lit(" v2")))
            .otherwise($"text").as("text")))
  }

  /** Per-source token-budget trim — "cap every source at half its
    * tokens" (over-represented-source downsampling, the applying twin
    * of [[mix]]'s report): docs are consumed in deterministic
    * content-hash order (rerun-stable, no rand()) and a source stops
    * accepting once its running token total reaches half the source's
    * grand total. Output = the kept listing with each doc's exclusive
    * running total, so the cut is auditable.
    *
    * `source` is a bounded-domain key, so a cumulative window
    * partitioned by source alone would sort a whole source's corpus in
    * one task (the NTILE trap). This is [[packBatchesOf]]'s two-pass
    * distributed prefix sum instead, keyed by source: hash-bucket
    * quantile literals → per-(source, bucket) totals (metadata-sized;
    * its source-partitioned windows are bounded by configuration) →
    * broadcast offsets back, each task prefix-summing only its own
    * (source, bucket) slice. The half-budget compare stays in integer
    * arithmetic (`2·cum < total`) — no doubles near the contract.
    */
  def budgetTrim(spark: SparkSession, dir: String,
      buckets: Int = 32): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir).select($"doc_id", $"source", hashBucket.as("hb"),
      size(split($"text", " ")).cast("long").as("n_tokens"))
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else d.stat.approxQuantile("hb", probes, 0.001).distinct.sorted
    val hbd = $"hb".cast("double")
    val bucketExpr =
      if (bounds.isEmpty) lit(0)
      else {
        val arr = array(bounds.toIndexedSeq.map(lit(_)): _*)
        size(filter(arr, b => b < hbd))
      }
    val bucketed = d.withColumn("__bucket", bucketExpr)
    val offW = Window.partitionBy($"source").orderBy($"__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy($"source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = bucketed.groupBy($"source", $"__bucket")
      .agg(sum($"n_tokens").as("__tot"))
      .withColumn("__off", coalesce(sum($"__tot").over(offW), lit(0L)))
      .withColumn("__total", sum($"__tot").over(totW))
      .select($"source", $"__bucket", $"__off", $"__total")
    val localW = Window.partitionBy($"source", $"__bucket")
      .orderBy($"hb", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("__local", coalesce(sum($"n_tokens").over(localW), lit(0L)))
      .join(broadcast(offsets), Seq("source", "__bucket"))
      .withColumn("cum_before", $"__off" + $"__local")
      .filter(lit(2L) * $"cum_before" < $"__total")
      .select($"doc_id", $"source", $"n_tokens", $"cum_before")
      .orderBy($"source", $"cum_before", $"doc_id")
  }

  /** Docs per batch in [[bucketBatches]]. */
  val BucketBatchSize = 16

  /** LENGTH-BUCKETED BATCHING — the dynamic-batching verb: docs are
    * grouped into power-of-two token-length bins ([[lengthHisto]]'s
    * exact-integer bin), ordered within the bin by content hash
    * (rerun-stable, engine-replayable — no rand()), and cut into
    * batches of [[BucketBatchSize]]; each batch pads to its LONGEST
    * member. The report prices the scheme per bin: padded-token mass
    * and the pad ppm — bucketing by length is what keeps that number
    * near zero, vs [[padWaste]]'s fixed-sequence baseline where every
    * short doc pays the full window.
    *
    * Scale shape: the bin key is BOUNDED-DOMAIN (~20 values), so the
    * within-bin rank never runs as one window over a whole bin (the
    * NTILE trap): rows are sub-bucketed by fixed hb-quantile literals
    * ([[budgetTrim]]'s two-pass prefix sum), each (bin, sub-bucket)
    * cell ranks locally, and the cross-cell offsets ride a
    * metadata-sized broadcast. Quantile-bucket boundaries respect hb
    * order, so the composite order equals (hb, doc_id) exactly — the
    * oracle replays it with one plain PARTITION BY bin window.
    * Everything downstream aggregates on (bin, batch) — keyed,
    * map-side combinable, never a global sort.
    */
  def bucketBatches(spark: SparkSession, dir: String,
      buckets: Int = 32): DataFrame = {
    import spark.implicits._
    val pows = (1 to LengthHistoMaxPow).map(i => 1L << i)
    val d = docs(spark, dir).select($"doc_id", hashBucket.as("hb"),
        size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("bin", size(filter(
        array(pows.map(lit(_)): _*), p => p <= $"n_tok")).cast("long"))
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else d.stat.approxQuantile("hb", probes, 0.001).distinct.sorted
    val hbd = $"hb".cast("double")
    val bucketExpr =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.toIndexedSeq.map(lit(_)): _*), b => b < hbd))
    val bucketed = d.withColumn("__bucket", bucketExpr)
    val offW = Window.partitionBy($"bin").orderBy($"__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy($"bin", $"__bucket")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum($"__n").over(offW), lit(0L)))
      .select($"bin", $"__bucket", $"__off")
    val localW = Window.partitionBy($"bin", $"__bucket").orderBy($"hb", $"doc_id")
    val perBatch = bucketed
      .withColumn("__rn", row_number().over(localW).cast("long"))
      .join(broadcast(offsets), Seq("bin", "__bucket"))
      .withColumn("batch", expr(s"(__off + __rn - 1) div $BucketBatchSize"))
      .groupBy($"bin", $"batch")
      .agg(count(lit(1)).as("bn"), max($"n_tok").as("bmax"), sum($"n_tok").as("btok"))
    perBatch.groupBy($"bin")
      .agg(sum($"bn").as("n_docs"), count(lit(1)).as("n_batches"),
        sum($"btok").as("n_tokens"), sum($"bmax" * $"bn").as("n_padded"))
      .withColumn("pad_ppm", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * (n_padded - n_tokens)) div n_padded AS BIGINT)"))
      .orderBy($"bin")
  }

  /** Curriculum ordering — the "train easy-to-hard" permutation: every
    * doc's position in a global order keyed by (classifier score asc,
    * content hash, doc_id). The score is [[TextAnalysis.classifyDocs]]'
    * exact integer BoW dot product (broadcast weights, map-side agg);
    * the contiguous global position is `Ranking.globalRowNumber`
    * bucketed BY THE SCORE itself — equal scores share a bucket (the
    * boundary expression is deterministic per value), the within-
    * bucket window sorts one score-slice per task, never the corpus.
    * Same machinery as [[shuffleOrder]], different sort key: shuffle
    * randomizes, curriculum grades.
    */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = TextAnalysis.classifyDocs(spark, dir).select($"doc_id", $"score")
    val keyed = docs(spark, dir).select($"doc_id", hashBucket.as("hb"))
      .join(scored, Seq("doc_id"))
    Ranking.globalRowNumber(keyed, "phase_pos", buckets = 32,
        bucketCol = "score", ascending = true, $"score", $"hb", $"doc_id")
      .select($"doc_id", $"score", $"phase_pos")
      .orderBy($"phase_pos")
  }

  /** Rows returned by [[topNSample]]. */
  val TopNSampleN = 100

  /** Exactly-N deterministic sample — the "give me 100 docs for the
    * eval set / human audit" verb, content-keyed: the N hash-smallest
    * documents by (md5(text), doc_id). Unlike the rate-based
    * [[sample]] the size is exact; unlike [[groupSample]] it ignores
    * cells. Distributed shape: `ORDER BY ... LIMIT n` compiles to
    * TakeOrdered (per-partition n-heaps, one n-row merge — no global
    * sort); the contiguous position is attached by the explicit
    * bounded single-reducer rank over the n surviving rows.
    */
  def topNSample(spark: SparkSession, dir: String,
      n: Int = TopNSampleN): DataFrame = {
    import spark.implicits._
    val top = docs(spark, dir)
      .select($"doc_id", md5($"text").as("fingerprint"))
      .orderBy($"fingerprint", $"doc_id")
      .limit(n)
    Ranking.boundedRowNumber(top, "pos", $"fingerprint", $"doc_id")
      .select($"pos", $"doc_id", $"fingerprint")
      .orderBy($"pos")
  }

  /** Per-source dedup SAVINGS — what exact dedup would give back, in
    * the unit budgets are set in (tokens): per source, the docs and
    * tokens total, the duplicated-copy count, and the tokens freed by
    * keeping one copy per fingerprint ((copies−1)·tokens; identical
    * text ⇒ identical token count, so the accounting is exact). The
    * duplicate-rate report says how MANY; this says how MUCH — the
    * number that decides whether the dedup pass pays for itself. Two
    * keyed aggregates: (source, fingerprint) then source.
    */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"source", md5($"text").as("fp"),
        size(split($"text", " ")).cast("long").as("n_tok"))
      .groupBy($"source", $"fp")
      .agg(count(lit(1)).as("copies"), min($"n_tok").as("n_tok"))
      .groupBy($"source")
      .agg(sum($"copies").as("n_docs"),
        sum($"copies" * $"n_tok").as("n_tokens"),
        sum($"copies" - 1).as("n_dup_docs"),
        sum(($"copies" - 1) * $"n_tok").as("tokens_saved"))
      .orderBy($"source")
  }

  /** Highest power-of-two boundary for [[lengthHisto]]'s bins. */
  val LengthHistoMaxPow = 20

  /** Per-source document-LENGTH histogram — the data-card table every
    * corpus release prints: per (source, ⌊log₂ tokens⌋ bin) the doc
    * count and token mass. The bin is computed as "how many powers of
    * two are ≤ n" over a 20-entry literal array — EXACT integer
    * arithmetic in both engines, where `floor(log2(n))` would hang the
    * bin boundary on an IEEE log's ulp (log2(8) can evaluate to
    * 2.999…96 when lowered to ln(x)/ln(2)). One keyed aggregate over
    * a (source × ≤21)-bounded key.
    */
  def lengthHisto(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pows = (1 to LengthHistoMaxPow).map(i => 1L << i)
    docs(spark, dir)
      .select($"source", size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("bin", size(filter(
        array(pows.map(lit(_)): _*), p => p <= $"n_tok")).cast("long"))
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .orderBy($"source", $"bin")
  }

  /** Sliding n-gram width for [[decontamNgram]] (the GPT-3/PaLM-style
    * 13-gram convention) and the id shift for its planted
    * contamination docs.
    */
  val DecontamN = 13
  val DecontamShift = 6000000L

  /** Sliding 13-GRAM decontamination — the industry-standard eval
    * hygiene check ([[clean]]'s head fingerprint catches verbatim
    * copies that START like a benchmark doc; this catches a benchmark
    * passage spliced ANYWHERE): a scanned doc is contaminated when any
    * of its sliding [[DecontamN]]-grams appears in the benchmark
    * set's n-gram roster, reported as (doc_id, n distinct overlapping
    * grams) — the drill-down a removal decision reads. The corpus is
    * word soup, so deterministic contamination is planted both
    * engines replay: every benchmark doc re-enters as a synthetic doc
    * carrying one mid-document benchmark 13-gram plus a unique tail.
    *
    * Scale shape: sliding grams are a map-only explode (stride 1 —
    * ~one row per token, same cardinality as the shingle machinery);
    * the benchmark roster is distinct-fingerprint-keyed (broadcast-
    * sized for any real benchmark suite, keyed equi-join in the
    * general form here) and the verdict is one doc-keyed count.
    */
  def decontamNgram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def grams = expr(s"transform(sequence(1, size(t) - ${DecontamN - 1}), " +
      s"i -> md5(array_join(slice(t, i, $DecontamN), ' ')))")
    val d = docs(spark, dir).select($"doc_id", split($"text", " ").as("t"))
    val bench = d.filter($"doc_id" % BenchMod === 0)
    val planted = bench.filter(size($"t") >= DecontamN + 5)
      .select(($"doc_id" + DecontamShift).as("doc_id"),
        split(concat(array_join(slice($"t", 6, DecontamN), " "),
          lit(" zq"), $"doc_id".cast("string")), " ").as("t"))
    val bg = bench.filter(size($"t") >= DecontamN)
      .select(explode(grams).as("g")).distinct()
    d.filter($"doc_id" % BenchMod =!= 0).unionAll(planted)
      .filter(size($"t") >= DecontamN)
      .select($"doc_id", explode(grams).as("g"))
      .distinct()
      .join(bg, Seq("g"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy($"doc_id")
  }

  /** Training sequence length assumed by [[padWaste]]. */
  val PadSeqLen = 512L

  /** Padding-waste report at a fixed training sequence length — the
    * motivating metric for sequence packing: per source, if every doc
    * were padded out to a multiple of [[PadSeqLen]] on its own, how
    * many sequences result and what fraction of the slots is padding
    * (the number `packBatchesOf` exists to drive toward zero). Exact
    * integers end-to-end: ceil is `(n + L−1) div L` on non-negative
    * counts, and the ppm passes through DECIMAL before the ×10⁶ so a
    * 100 TB token total cannot wrap BIGINT. One keyed aggregate over
    * the bounded source domain.
    */
  def padWaste(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"source", size(split($"text", " ")).cast("long").as("n_tok"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        sum(expr(s"(n_tok + ${PadSeqLen - 1}) div $PadSeqLen")).as("n_seqs"))
      .withColumn("n_pad", $"n_seqs" * PadSeqLen - $"n_tokens")
      .withColumn("pad_ppm", expr(
        s"CAST((CAST(n_pad AS DECIMAL(38,0)) * 1000000) div (n_seqs * $PadSeqLen) AS BIGINT)"))
      .orderBy($"source")
  }

  /** Token-budget denominator for [[temperature]]'s sampling rates:
    * the temperature recipe is applied against a budget of
    * total_tokens / TempBudgetDen.
    */
  val TempBudgetDen = 2L

  /** TEMPERATURE-weighted mixture sampling at τ = 0.5 — the standard
    * multilingual/multi-source rebalancing verb (sample source s with
    * probability ∝ n_s^τ, flattening the head so low-resource sources
    * are not drowned): per source the natural token share, the
    * temperature share, and the per-doc keep rate that realizes the
    * temperature mix inside a token budget of total/[[TempBudgetDen]],
    * plus the count of docs the content-hash threshold actually keeps
    * at that rate. τ = 0.5 is deliberately the EXACT case: n^0.5 is
    * integer sqrt, computed as floor(sqrt(double)) plus a ±1 integer
    * correction (`(w+1)² ≤ n` / `w² > n`), so no IEEE rounding — and
    * no pow() disagreement between engines — ever decides a weight.
    * All shares are integer ppm; products route through DECIMAL before
    * the ×10⁶ (a 100 TB token total wraps BIGINT otherwise; DuckDB
    * mirrors in HUGEINT).
    *
    * Scale shape: one per-source aggregate (bounded domain), the
    * grand totals via one broadcast fan-out, the application one
    * broadcast join of the ≤|sources| rate table back to the corpus
    * followed by a map-side-combinable count. The doc scan never
    * shuffles on a data-scaled key.
    */
  def temperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
      .select($"source", size(split($"text", " ")).cast("long").as("tok"),
        hashBucket.as("hb"))
    val agged = d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"tok").as("n_tokens"))
      .withColumn("w0", expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)"))
      .withColumn("weight", expr(
        """CASE WHEN (w0 + 1) * (w0 + 1) <= n_tokens THEN w0 + 1
          |     WHEN w0 * w0 > n_tokens THEN w0 - 1
          |     ELSE w0 END""".stripMargin))
      .drop("w0")
    val rates = agged
      .crossJoin(broadcast(agged.agg(
        sum($"n_tokens").as("__tt"), sum($"weight").as("__tw"))))
      .withColumn("natural_ppm", expr(
        "CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000000) div __tt AS BIGINT)"))
      .withColumn("temp_ppm", expr(
        "CAST((CAST(weight AS DECIMAL(38,0)) * 1000000) div __tw AS BIGINT)"))
      .withColumn("rate_ppm", expr(
        s"""least(CAST(1000000 AS BIGINT), CAST(
           |  CAST((CAST(__tt div $TempBudgetDen AS DECIMAL(38,0)) * weight) div __tw
           |       AS DECIMAL(38,0)) * 1000000 div n_tokens
           |  AS BIGINT))""".stripMargin))
      .drop("__tt", "__tw")
    val kept = d.join(broadcast(rates.select($"source", $"rate_ppm")), Seq("source"))
      .filter($"hb" * 1000000L < $"rate_ppm" * 65536L)
      .groupBy($"source").agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .withColumn("n_kept", coalesce($"n_kept", lit(0L)))
      .orderBy($"source")
  }

  /** [[temperature]]'s gate applied to the corpus itself — the batch
    * twin of [[graft.streaming.EventStreams.temperatureGate]] (same
    * operator instance, stream/batch parity spec-pinned): compute the
    * per-source rate table, then emit the doc ids the content-hash
    * threshold admits. This is the query a training run actually
    * materializes (the sampled mix); [[temperature]] is its report.
    */
  def temperatureGateBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rates = temperature(spark, dir).select($"source", $"rate_ppm")
    graft.streaming.EventStreams.temperatureGate(docs(spark, dir), rates)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** Hashed feature-space size for [[dsir]]: one byte of md5(word)
    * → 256 buckets, bounded by construction (mirrored in the oracle).
    */
  val DsirBuckets = 256

  /** The slice [[dsir]]'s importance weights steer toward — the
    * "target distribution" of importance resampling. `en` is the
    * fixture's largest language; a deployment points this at its
    * curated reference corpus instead.
    */
  val DsirTargetLang = "en"

  /** ⌊log₂ 10⁶⌋ — the ppm scale's own log₂ floor, subtracted from
    * each bucket's log-ratio so a bucket with identical target/raw
    * probability weighs ~0.
    */
  val DsirScaleLog = 19

  /** log₂ floor as EXACT integer arithmetic on both engines: the
    * count of powers of two ≤ x, minus one (x ≤ 0 → −1) over 63
    * static literals — never an IEEE log() whose ulp could flip a
    * bucket weight between engines (the [[lengthHisto]] device).
    */
  private def ilog2Frag(x: String, duck: Boolean): String = {
    val arr = (0 to 62).map(i => 1L << i).mkString(", ")
    if (duck) s"(len(list_filter([$arr], p -> p <= $x)) - 1)"
    else s"(size(filter(array($arr), p -> p <= $x)) - 1)"
  }

  /** DSIR-style IMPORTANCE RESAMPLING report — the data-selection
    * verb of Xie et al.'s "Data Selection for Language Models via
    * Importance Resampling" (arXiv:2302.03169), restated in exact
    * integer arithmetic: documents are scored by how much more likely
    * their hashed-unigram profile is under a TARGET distribution (the
    * [[DsirTargetLang]] slice) than under the raw corpus, and the
    * keep decision is `score > 0` (more target-like than background).
    *
    * Per hashed bucket b (one md5 byte, [[DsirBuckets]] cells):
    * add-one-smoothed counts (c_t+1)/(c_r+1) normalized by the bucket
    * totals give the importance ratio in ppm — products routed
    * through DECIMAL (a 100 TB token count squared passes BIGINT);
    * the per-token weight is the ratio's log₂ floor (exact via
    * [[ilog2Frag]]) minus [[DsirScaleLog]], and a doc's score is the
    * sum of its tokens' weights — the log-likelihood-ratio surrogate
    * with every step integer, so the oracle replays it bit-for-bit.
    *
    * Scale shape: ONE token-stream aggregate builds both bucket
    * counts (conditional sum — the raw and target tallies share a
    * pass), collapsing map-side to ≤[[DsirBuckets]] rows per task;
    * the weight table (≤256 rows) broadcasts back onto the token
    * stream, and the per-doc sum's partial aggregation collapses
    * within partitions (a doc's tokens never span partitions) before
    * the doc-keyed exchange. The report is a bounded (source, lang)
    * aggregate. No data-scaled shuffle key anywhere.
    */
  /** Per-doc DSIR scores — the shared core of the [[dsir]] report and
    * the [[dsirApply]] selection step.
    */
  private def dsirScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = docs(spark, dir)
      .select($"doc_id", $"source", $"lang",
        explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .withColumn("b", expr("CAST(conv(substr(md5(w), 1, 2), 16, 10) AS BIGINT)"))
    val buckets = toks.groupBy($"b").agg(
      count(lit(1)).as("cr"),
      sum(when($"lang" === DsirTargetLang, 1L).otherwise(0L)).as("ct"))
    val weights = buckets
      .crossJoin(broadcast(buckets.agg(
        sum($"cr" + 1).as("__nr"), sum($"ct" + 1).as("__nt"))))
      .withColumn("ratio_ppm", expr(
        """CAST((CAST(1000000 AS DECIMAL(38,0)) * (ct + 1) * __nr)
          |     div ((cr + 1) * CAST(__nt AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
      .withColumn("weight",
        expr(s"${ilog2Frag("ratio_ppm", duck = false)} - $DsirScaleLog"))
      .select($"b", $"weight")
    toks.join(broadcast(weights), Seq("b"))
      .groupBy($"doc_id", $"source", $"lang")
      .agg(sum($"weight").as("score"))
  }

  /** [[dsir]]'s APPLY step — the selected subset itself (docs more
    * target-like than background, score > 0), the frame a curation
    * pipeline feeds downstream; same shape conventions as the other
    * report/apply pairs (filter→surpriseFilter, chunk→chunkDedupApply).
    */
  def dsirApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dsirScores(spark, dir)
      .filter($"score" > 0)
      .select($"doc_id", $"source", $"lang", $"score")
      .orderBy($"doc_id")
  }

  def dsir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dsirScores(spark, dir)
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"score" > 0, 1L).otherwise(0L)).as("n_keep"),
        sum($"score").as("score_sum"))
      .orderBy($"source", $"lang")
  }

  /** Rows kept per (source, lang) cell by [[groupSample]]. */
  val GroupSampleK = 5

  /** Deterministic k-per-cell sampling — the "show me 5 examples from
    * every (source, language) cell" verb audits and eval-set seeding
    * run: rank within the cell by (content hash, doc_id) — a total
    * order that is rerun-stable and content-keyed, no rand() — and
    * keep rank ≤ k. The rank filter compiles to WindowGroupLimit:
    * every map task pre-prunes to k rows per cell before the exchange,
    * so the bounded-domain partition key never sorts a whole cell's
    * corpus in one task (the NTILE trap) — post-prune window input is
    * ≤ k·partitions·cells, configuration not data.
    */
  def groupSample(spark: SparkSession, dir: String,
      k: Int = GroupSampleK): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select($"doc_id", $"source", $"lang", md5($"text").as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source", $"lang").orderBy($"h", $"doc_id")).cast("long"))
      .filter($"rn" <= k)
      .select($"doc_id", $"source", $"lang", $"rn")
      .orderBy($"source", $"lang", $"rn")
  }

  /** Deterministic global SHUFFLE order — the "randomize the corpus
    * for training" verb, reproducibly: the order key is the 16-bit
    * content-hash bucket (then doc_id), so the permutation is
    * rerun-stable, engine-replayable, content-keyed (a rerun after an
    * upstream fix shuffles identically), and hash-uniform — the
    * statistical shuffle quality SGD needs without any rand(). The
    * contiguous 1-based position comes from `Ranking.globalRowNumber`
    * (quantile buckets + broadcast offsets — never an unpartitioned
    * window over the corpus).
    */
  def shuffleOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = docs(spark, dir)
      .select($"doc_id", hashBucket.as("hb"))
    Ranking.globalRowNumber(keyed, "shuffle_pos", buckets = 32,
      bucketCol = "hb", ascending = true,
      $"hb", $"doc_id")
      .select($"doc_id", $"hb", $"shuffle_pos")
      .orderBy($"shuffle_pos")
  }

  /** Shard count for [[shardManifest]] / [[shardWrite]] (mirrored in
    * the oracle). Real runs size this so one shard ≈ one reader's
    * appetite; the assignment formula is shard-count-agnostic.
    */
  val ShardCount = 8

  /** The [[shuffleOrder]] permutation with the content key kept and a
    * contiguous-range shard id attached: shard = ⌊(pos−1)·n/total⌋, so
    * shard k owns exactly the positions in [k·total/n, (k+1)·total/n)
    * — disjoint, gap-free, balanced to ±1 row by construction. The
    * total rides the broadcast-grand-total shape (exchange reused).
    */
  private def shardFrame(spark: SparkSession, dir: String,
      nShards: Int): DataFrame = {
    import spark.implicits._
    val keyed = docs(spark, dir).select($"doc_id", hashBucket.as("hb"),
      expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS DECIMAL(19,0))").as("k"))
    Ranking.globalRowNumber(keyed, "shuffle_pos", buckets = 32,
        bucketCol = "hb", ascending = true, $"hb", $"doc_id")
      .crossJoin(broadcast(keyed.agg(count(lit(1)).as("__n"))))
      .withColumn("shard", expr(s"((shuffle_pos - 1) * $nShards) div __n"))
      .select($"doc_id", $"shuffle_pos", $"shard", $"k")
  }

  /** Per-shard manifest of the training-data handoff: doc count,
    * position range, and the order-independent mod-2⁶¹ content digest
    * ([[manifest]]'s reduction) — what a pretraining run records
    * beside each shard so any replica can verify its copy without
    * rereading the corpus.
    */
  def shardManifest(spark: SparkSession, dir: String,
      nShards: Int = ShardCount): DataFrame = {
    import spark.implicits._
    shardFrame(spark, dir, nShards)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        min($"shuffle_pos").as("min_pos"),
        max($"shuffle_pos").as("max_pos"),
        expr("CAST(CAST(sum(k) AS DECIMAL(38,0)) % 2305843009213693952 AS BIGINT)")
          .as("digest_61"))
      .orderBy($"shard")
  }

  /** MATERIALIZE the shuffled corpus as `nShards` shard directories —
    * the artifact a pretraining run actually consumes: each shard is
    * one contiguous `shuffle_pos` range (so readers stream their shard
    * in SGD order with zero coordination), rows sorted by position
    * within the shard, written via `partitionBy` so the shard id is
    * path-addressable. Returns the manifest RECOMPUTED FROM THE
    * WRITTEN FILES — the caller compares it to [[shardManifest]] to
    * certify the handoff (the spec does exactly this).
    */
  def shardWrite(spark: SparkSession, dir: String, outDir: String,
      nShards: Int = ShardCount): DataFrame = {
    import spark.implicits._
    shardFrame(spark, dir, nShards)
      .repartition(nShards, $"shard")
      .sortWithinPartitions($"shuffle_pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    spark.read.parquet(outDir)
      .select($"doc_id", $"shuffle_pos", $"shard".cast("long").as("shard"), $"k")
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        min($"shuffle_pos").as("min_pos"),
        max($"shuffle_pos").as("max_pos"),
        expr("CAST(CAST(sum(k) AS DECIMAL(38,0)) % 2305843009213693952 AS BIGINT)")
          .as("digest_61"))
      .orderBy($"shard")
  }

  /** MODEL-RANKED per-cell selection — [[groupSample]]'s quality twin
    * (best-of-cell instead of uniform): keep the k highest classifier
    * scores per (source, lang), tie-broken by doc_id — the "take the
    * best N documents from every source" curation verb, with the model
    * applied exactly as `TextAnalysis.classify` (broadcast weight
    * table, integer dot product). The rank filter compiles to
    * WindowGroupLimit like groupSample's, so cells pre-prune map-side.
    */
  def bestOfCell(spark: SparkSession, dir: String,
      k: Int = GroupSampleK): DataFrame = {
    import spark.implicits._
    val scores = TextAnalysis.classifyDocs(spark, dir).select($"doc_id", $"score")
    docs(spark, dir).select($"doc_id", $"source", $"lang")
      .join(scores, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source", $"lang").orderBy($"score".desc, $"doc_id")).cast("long"))
      .filter($"rn" <= k)
      .select($"doc_id", $"source", $"lang", $"score", $"rn")
      .orderBy($"source", $"lang", $"rn")
  }

  /** Near-dup similarity floor for the [[leakage]] audit. */
  val LeakJaccard = 0.5

  /** Train/test LEAKAGE audit — the check an eval-honest pipeline runs
    * before shipping a split: near-duplicate document pairs (MinHash
    * estimate ≥ [[LeakJaccard]]) whose members landed in DIFFERENT
    * splits, counted per split pair. Content-hash splitting pins exact
    * duplicates to one split by construction, but near-dups hash apart
    * — this query measures exactly that residue (and motivates running
    * dedup BEFORE splitting). Composes the LSH candidate machinery
    * with the split assignment: two id-keyed joins over the pair list,
    * nothing new to shuffle at scale.
    */
  def leakage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val split = splitAssign(spark, dir).select($"doc_id", $"split")
    Dedup.minhashLsh(spark, dir)
      .filter($"est_jaccard" >= LeakJaccard)
      .join(split.select($"doc_id".as("doc_a"), $"split".as("split_a")), Seq("doc_a"))
      .join(split.select($"doc_id".as("doc_b"), $"split".as("split_b")), Seq("doc_b"))
      .filter($"split_a" =!= $"split_b")
      .groupBy($"split_a", $"split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"split_a", $"split_b")
  }

  /** Mixture accounting per (source, lang): document and token counts
    * plus each cell's share of total tokens — the table a data-mixing
    * recipe (Pile/CC-style source weights) is computed from. One
    * aggregation pass; the grand total rides the broadcast-join shape
    * (exchange reused), never an unpartitioned window.
    */
  def mix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agged = docs(spark, dir)
      .select($"source", $"lang", size(split($"text", " ")).cast("long").as("tok"))
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"tok").as("n_tokens"))
    agged
      .crossJoin(broadcast(agged.agg(sum($"n_tokens").as("__t"))))
      .withColumn("token_share", $"n_tokens" * lit(1.0) / $"__t")
      .drop("__t")
      .orderBy($"source", $"lang")
  }

  /** The decontamination APPLY step: the corpus with benchmark-
    * colliding documents REMOVED — [[contamination]]'s complement, as
    * a broadcast LEFT ANTI join on the same head fingerprint. Semi
    * flags, anti cleans; a pipeline runs both.
    */
  def clean(spark: SparkSession, dir: String,
      benchMod: Int = BenchMod): DataFrame = {
    import spark.implicits._
    val f = docs(spark, dir)
      .select($"doc_id", TextAnalysis.headMd5(split($"text", " ")).as("head_md5"))
    val bench = f.filter($"doc_id" % benchMod === 0).select($"head_md5")
    f.filter($"doc_id" % benchMod =!= 0)
      .join(broadcast(bench), Seq("head_md5"), "left_anti")
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_clean" -> ((s: SparkSession, d: String) => clean(s, d)),
    "corpus_mix" -> mix _,
    "corpus_stratified" -> stratified _,
    "corpus_sample" -> ((s: SparkSession, d: String) => sample(s, d)),
    "corpus_weighted_sample" -> weightedSample _,
    "corpus_split" -> splitAssign _,
    "corpus_pack_batches" -> ((s: SparkSession, d: String) => packBatches(s, d)),
    "corpus_pack_bpe" ->
      ((s: SparkSession, d: String) => packBatches(s, d, tokens = bpeProxyTokens)),
    "corpus_contamination" -> ((s: SparkSession, d: String) => contamination(s, d)),
    "corpus_leakage" -> leakage _,
    "corpus_diff" -> snapshotDiffHalves _,
    "corpus_manifest" -> manifest _,
    "corpus_manifest_diff" -> manifestDiffHalves _,
    "corpus_budget_trim" -> ((s: SparkSession, d: String) => budgetTrim(s, d)),
    "corpus_curriculum" -> curriculum _,
    "corpus_topn_sample" -> ((s: SparkSession, d: String) => topNSample(s, d)),
    "dedup_savings" -> dedupSavings _,
    "corpus_length_histo" -> lengthHisto _,
    "corpus_pad_waste" -> padWaste _,
    "corpus_temperature" -> temperature _,
    "corpus_temperature_gate" -> temperatureGateBatch _,
    "corpus_decontam_ngram" -> decontamNgram _,
    "corpus_shuffle" -> shuffleOrder _,
    "corpus_epochs" -> epochs _,
    "corpus_shards" -> ((s: SparkSession, d: String) => shardManifest(s, d)),
    "corpus_dsir" -> dsir _,
    "corpus_dsir_apply" -> dsirApply _,
    "corpus_bucket_batches" -> ((s: SparkSession, d: String) => bucketBatches(s, d)),
    "corpus_group_sample" -> ((s: SparkSession, d: String) => groupSample(s, d)),
    "corpus_best_of_cell" -> ((s: SparkSession, d: String) => bestOfCell(s, d)),
    "corpus_batch_stats" -> ((s: SparkSession, d: String) => batchStats(s, d)),
  )

  /** Shared DSIR oracle CTE chain (ends in `doc(doc_id, source, lang,
    * score)`) — the report and apply oracles both build on it.
    */
  private def dsirCtes: String =
    s"""tok AS (
      |  SELECT doc_id, source, lang, w,
      |         (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
      |       + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS b
      |  FROM (SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE len(w) > 0),
      |bk AS (SELECT b, count(*) AS cr,
      |         CAST(sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS BIGINT) AS ct
      |       FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(sum(cr + 1) AS BIGINT) AS nr,
      |               CAST(sum(ct + 1) AS BIGINT) AS nt FROM bk),
      |wt AS (SELECT b, ${ilog2Frag(
           "CAST((CAST(1000000 AS HUGEINT) * (ct + 1) * nr) // ((cr + 1) * CAST(nt AS HUGEINT)) AS BIGINT)",
           duck = true)} - $DsirScaleLog AS weight
      |       FROM bk, tot),
      |doc AS (SELECT doc_id, source, lang, CAST(sum(weight) AS BIGINT) AS score
      |        FROM tok JOIN wt USING (b) GROUP BY 1, 2, 3)""".stripMargin

  /** DuckDB equivalent of [[hashBucket]]: nibble arithmetic over the
    * same 4 hex chars (DuckDB has no conv()).
    */
  private val hbSql =
    "(" + (0 until 4).map(i =>
      s"(strpos('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}")
      .mkString(" + ") + ")"

  /** DuckDB mirror of the 60-bit content key (15 hex chars of
    * md5(text) — no conv() in DuckDB, so nibble arithmetic; all 15
    * terms are static multiplications, total stays BIGINT).
    */
  private val contentKeySql =
    "(" + (0 until 15).map(i =>
      s"(strpos('0123456789abcdef', substr(md5(text), ${i + 1}, 1)) - 1) * ${math.pow(16, 14 - i).toLong}")
      .mkString(" + ") + ")"

  val oracle: Map[String, String] = Map(
    "corpus_best_of_cell" ->
      s"""WITH wt AS (SELECT i AS bucket, i % 21 - 10 AS weight
        |            FROM generate_series(0, ${TextAnalysis.ClassifierBuckets - 1}) t(i)),
        |terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |b AS (SELECT doc_id,
        |        CAST((strpos('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 16
        |           + (strpos('0123456789abcdef', substr(md5(term), 2, 1)) - 1) AS BIGINT) AS bucket
        |      FROM terms),
        |sc AS (SELECT doc_id, CAST(sum(weight) AS BIGINT) AS score
        |       FROM b JOIN wt USING (bucket) GROUP BY 1),
        |r AS (SELECT d.doc_id, d.source, d.lang, sc.score,
        |        CAST(row_number() OVER (PARTITION BY d.source, d.lang
        |             ORDER BY sc.score DESC, d.doc_id) AS BIGINT) AS rn
        |      FROM documents d JOIN sc USING (doc_id))
        |SELECT doc_id, source, lang, score, rn FROM r WHERE rn <= $GroupSampleK
        |ORDER BY source, lang, rn""".stripMargin,
    "corpus_batch_stats" ->
      s"""WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
        |           FROM documents),
        |p AS (SELECT doc_id, lang, n_tokens,
        |        CAST(coalesce(CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |             // $PackBudget AS BIGINT) AS batch
        |      FROM t)
        |SELECT lang, batch, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |       CAST((CAST(sum(n_tokens) AS HUGEINT) * 1000000) // $PackBudget AS BIGINT) AS fill_ppm
        |FROM p GROUP BY 1, 2 ORDER BY lang, batch""".stripMargin,
    "corpus_shuffle" ->
      s"""WITH k AS (SELECT doc_id, $hbSql AS hb FROM documents)
        |SELECT doc_id, hb,
        |       CAST(row_number() OVER (ORDER BY hb, doc_id) AS BIGINT) AS shuffle_pos
        |FROM k ORDER BY shuffle_pos""".stripMargin,
    "corpus_epochs" -> {
      val wholeSql = "CASE " + EpochRecipe.map { case (s, w, _) =>
        s"WHEN source = '$s' THEN $w" }.mkString(" ") +
        s" ELSE ${EpochDefault._1} END"
      val fracSql = "CASE " + EpochRecipe.map { case (s, _, f) =>
        s"WHEN source = '$s' THEN $f" }.mkString(" ") +
        s" ELSE ${EpochDefault._2} END"
      s"""WITH d AS (SELECT doc_id, source, $hbSql AS hb FROM documents),
        |n AS (SELECT doc_id, source,
        |        CAST(($wholeSql) + (CASE WHEN hb < ($fracSql) THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
        |      FROM d)
        |SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy
        |FROM n WHERE n_copies > 0
        |ORDER BY doc_id, copy""".stripMargin
    },
    "corpus_length_histo" -> {
      val powsList = (1 to LengthHistoMaxPow).map(i => 1L << i).mkString("[", ", ", "]")
      s"""WITH d AS (SELECT source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents)
        |SELECT source,
        |       CAST(len(list_filter($powsList, p -> p <= n_tok)) AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM d GROUP BY 1, 2 ORDER BY source, bin""".stripMargin
    },
    "corpus_decontam_ngram" -> {
      val g = s"list_transform(generate_series(1, len(t) - ${DecontamN - 1}), " +
        s"i -> md5(array_to_string(t[i : i + ${DecontamN - 1}], ' ')))"
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bench AS (SELECT * FROM d WHERE doc_id % $BenchMod = 0),
        |planted AS (SELECT doc_id + $DecontamShift AS doc_id,
        |              string_split(array_to_string(t[6 : ${6 + DecontamN - 1}], ' ')
        |                || ' zq' || doc_id, ' ') AS t
        |            FROM bench WHERE len(t) >= ${DecontamN + 5}),
        |bg AS (SELECT DISTINCT g FROM
        |         (SELECT unnest($g) AS g FROM bench WHERE len(t) >= $DecontamN)),
        |scan AS (SELECT * FROM d WHERE doc_id % $BenchMod <> 0
        |         UNION ALL SELECT * FROM planted),
        |sg AS (SELECT DISTINCT doc_id, g FROM
        |         (SELECT doc_id, unnest($g) AS g
        |          FROM scan WHERE len(t) >= $DecontamN))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM sg JOIN bg USING (g)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin
    },
    "corpus_temperature" ->
      s"""WITH d AS (SELECT source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |             $hbSql AS hb
        |           FROM documents),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(tok) AS BIGINT) AS n_tokens
        |      FROM d GROUP BY 1),
        |w0 AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w0 FROM a),
        |wa AS (SELECT source, n_docs, n_tokens,
        |         CASE WHEN (w0 + 1) * (w0 + 1) <= n_tokens THEN w0 + 1
        |              WHEN w0 * w0 > n_tokens THEN w0 - 1
        |              ELSE w0 END AS weight
        |       FROM w0),
        |t AS (SELECT CAST(sum(n_tokens) AS HUGEINT) AS tt,
        |        CAST(sum(weight) AS HUGEINT) AS tw FROM wa),
        |r AS (SELECT source, n_docs, n_tokens, weight,
        |        CAST(CAST(n_tokens AS HUGEINT) * 1000000 // tt AS BIGINT) AS natural_ppm,
        |        CAST(CAST(weight AS HUGEINT) * 1000000 // tw AS BIGINT) AS temp_ppm,
        |        CAST(least(1000000,
        |          ((tt // $TempBudgetDen) * weight // tw) * 1000000 // n_tokens)
        |          AS BIGINT) AS rate_ppm
        |      FROM wa, t),
        |k AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
        |      FROM d JOIN r ON d.source = r.source
        |      WHERE d.hb * 1000000 < r.rate_ppm * 65536
        |      GROUP BY 1)
        |SELECT r.source, n_docs, n_tokens, weight, natural_ppm, temp_ppm, rate_ppm,
        |       coalesce(k.n_kept, 0) AS n_kept
        |FROM r LEFT JOIN k ON r.source = k.source
        |ORDER BY r.source""".stripMargin,
    "corpus_temperature_gate" ->
      s"""WITH d AS (SELECT doc_id, source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |             $hbSql AS hb
        |           FROM documents),
        |a AS (SELECT source, CAST(sum(tok) AS BIGINT) AS n_tokens
        |      FROM d GROUP BY 1),
        |w0 AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w0 FROM a),
        |wa AS (SELECT source, n_tokens,
        |         CASE WHEN (w0 + 1) * (w0 + 1) <= n_tokens THEN w0 + 1
        |              WHEN w0 * w0 > n_tokens THEN w0 - 1
        |              ELSE w0 END AS weight
        |       FROM w0),
        |t AS (SELECT CAST(sum(n_tokens) AS HUGEINT) AS tt,
        |        CAST(sum(weight) AS HUGEINT) AS tw FROM wa),
        |r AS (SELECT source,
        |        CAST(least(1000000,
        |          ((tt // $TempBudgetDen) * weight // tw) * 1000000 // n_tokens)
        |          AS BIGINT) AS rate_ppm
        |      FROM wa, t)
        |SELECT d.doc_id, d.source
        |FROM d JOIN r ON d.source = r.source
        |WHERE d.hb * 1000000 < r.rate_ppm * 65536
        |ORDER BY d.doc_id""".stripMargin,
    "corpus_pad_waste" ->
      s"""WITH d AS (SELECT source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |        CAST(sum((n_tok + ${PadSeqLen - 1}) // $PadSeqLen) AS BIGINT) AS n_seqs
        |      FROM d GROUP BY 1)
        |SELECT source, n_docs, n_tokens, n_seqs,
        |       n_seqs * $PadSeqLen - n_tokens AS n_pad,
        |       CAST(((n_seqs * $PadSeqLen - n_tokens) * 1000000)
        |            // (n_seqs * $PadSeqLen) AS BIGINT) AS pad_ppm
        |FROM a ORDER BY source""".stripMargin,
    "corpus_topn_sample" ->
      s"""WITH t AS (SELECT doc_id, md5(text) AS fingerprint FROM documents
        |           ORDER BY fingerprint, doc_id LIMIT $TopNSampleN)
        |SELECT CAST(row_number() OVER (ORDER BY fingerprint, doc_id) AS BIGINT) AS pos,
        |       doc_id, fingerprint
        |FROM t ORDER BY pos""".stripMargin,
    "dedup_savings" ->
      """WITH f AS (SELECT source, md5(text) AS fp,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |g AS (SELECT source, fp, count(*) AS copies, min(n_tok) AS n_tok
        |      FROM f GROUP BY 1, 2)
        |SELECT source, CAST(sum(copies) AS BIGINT) AS n_docs,
        |       CAST(sum(copies * n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(copies - 1) AS BIGINT) AS n_dup_docs,
        |       CAST(sum((copies - 1) * n_tok) AS BIGINT) AS tokens_saved
        |FROM g GROUP BY 1 ORDER BY source""".stripMargin,
    "corpus_budget_trim" ->
      s"""WITH d AS (SELECT doc_id, source, $hbSql AS hb,
        |             len(string_split(text, ' ')) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY hb, doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
        |        sum(n_tokens) OVER (PARTITION BY source) AS total
        |      FROM d)
        |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, cum_before
        |FROM c WHERE 2 * cum_before < total
        |ORDER BY source, cum_before, doc_id""".stripMargin,
    "corpus_curriculum" ->
      s"""WITH wt AS (SELECT i AS bucket, i % 21 - 10 AS weight
        |            FROM generate_series(0, ${TextAnalysis.ClassifierBuckets - 1}) t(i)),
        |terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |b AS (SELECT doc_id,
        |        CAST((strpos('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 16
        |           + (strpos('0123456789abcdef', substr(md5(term), 2, 1)) - 1) AS BIGINT) AS bucket
        |      FROM terms),
        |sc AS (SELECT doc_id, CAST(sum(weight) AS BIGINT) AS score
        |       FROM b JOIN wt USING (bucket) GROUP BY 1),
        |k AS (SELECT d.doc_id, sc.score, $hbSql AS hb
        |      FROM documents d JOIN sc USING (doc_id))
        |SELECT doc_id, score,
        |       CAST(row_number() OVER (ORDER BY score, hb, doc_id) AS BIGINT) AS phase_pos
        |FROM k ORDER BY phase_pos""".stripMargin,
    "corpus_manifest_diff" ->
      s"""WITH oldd AS (SELECT source, lang, text FROM documents WHERE doc_id % 11 != 0),
        |newd AS (SELECT source, lang,
        |           CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |         FROM documents WHERE doc_id % 13 != 0),
        |mo AS (SELECT source, lang, count(*) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |         CAST(sum(CAST($contentKeySql AS HUGEINT)) % 2305843009213693952::HUGEINT AS BIGINT) AS digest
        |       FROM oldd GROUP BY 1, 2),
        |mn AS (SELECT source, lang, count(*) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |         CAST(sum(CAST($contentKeySql AS HUGEINT)) % 2305843009213693952::HUGEINT AS BIGINT) AS digest
        |       FROM newd GROUP BY 1, 2),
        |j AS (SELECT coalesce(mo.source, mn.source) AS source,
        |        coalesce(mo.lang, mn.lang) AS lang,
        |        CASE WHEN mo.digest IS NULL THEN 'added'
        |             WHEN mn.digest IS NULL THEN 'removed'
        |             WHEN mo.digest != mn.digest OR mo.n_docs != mn.n_docs
        |                  OR mo.n_tokens != mn.n_tokens THEN 'changed'
        |             ELSE 'unchanged' END AS status,
        |        CAST(coalesce(mo.n_docs, 0) AS BIGINT) AS n_docs_old,
        |        CAST(coalesce(mn.n_docs, 0) AS BIGINT) AS n_docs_new
        |      FROM mo FULL OUTER JOIN mn ON mo.source = mn.source AND mo.lang = mn.lang)
        |SELECT source, lang, status, n_docs_old, n_docs_new
        |FROM j WHERE status != 'unchanged' ORDER BY source, lang""".stripMargin,
    "corpus_shards" ->
      s"""WITH kd AS (SELECT doc_id, $hbSql AS hb, $contentKeySql AS k FROM documents),
        |r AS (SELECT doc_id, hb, k,
        |        CAST(row_number() OVER (ORDER BY hb, doc_id) AS BIGINT) AS pos,
        |        CAST(count(*) OVER () AS BIGINT) AS n
        |      FROM kd),
        |s AS (SELECT ((pos - 1) * $ShardCount) // n AS shard, pos, k FROM r)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |       count(*) AS n_docs,
        |       CAST(min(pos) AS BIGINT) AS min_pos,
        |       CAST(max(pos) AS BIGINT) AS max_pos,
        |       CAST(sum(CAST(k AS HUGEINT)) % 2305843009213693952::HUGEINT AS BIGINT) AS digest_61
        |FROM s GROUP BY 1 ORDER BY shard""".stripMargin,
    "corpus_manifest" ->
      s"""WITH d AS (SELECT source, lang,
        |             len(string_split(text, ' ')) AS tok,
        |             $contentKeySql AS k
        |           FROM documents)
        |SELECT source, lang, count(*) AS n_docs,
        |       CAST(sum(tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(CAST(k AS HUGEINT)) % 2305843009213693952::HUGEINT AS BIGINT) AS digest_61
        |FROM d GROUP BY 1, 2 ORDER BY source, lang""".stripMargin,
    "corpus_group_sample" ->
      s"""WITH h AS (SELECT doc_id, source, lang, md5(text) AS h FROM documents),
        |r AS (SELECT doc_id, source, lang,
        |        CAST(row_number() OVER (PARTITION BY source, lang
        |             ORDER BY h, doc_id) AS BIGINT) AS rn
        |      FROM h)
        |SELECT doc_id, source, lang, rn FROM r WHERE rn <= $GroupSampleK
        |ORDER BY source, lang, rn""".stripMargin,
    "corpus_clean" ->
      s"""WITH f AS (SELECT doc_id,
        |             md5(array_to_string((string_split(text, ' '))[1:5], ' ')) AS head_md5
        |           FROM documents),
        |bench AS (SELECT head_md5 FROM f WHERE doc_id % $BenchMod = 0)
        |SELECT doc_id FROM f
        |WHERE doc_id % $BenchMod <> 0
        |  AND head_md5 NOT IN (SELECT head_md5 FROM bench)
        |ORDER BY doc_id""".stripMargin,
    "corpus_mix" ->
      """WITH b AS (SELECT source, lang, len(string_split(text, ' ')) AS tok FROM documents),
        |a AS (SELECT source, lang, count(*) AS n_docs,
        |        CAST(sum(tok) AS BIGINT) AS n_tokens
        |      FROM b GROUP BY 1, 2)
        |SELECT source, lang, n_docs, n_tokens,
        |       n_tokens * 1.0 / (SELECT CAST(sum(n_tokens) AS BIGINT) FROM a) AS token_share
        |FROM a ORDER BY source, lang""".stripMargin,
    "corpus_stratified" ->
      s"""WITH d AS (SELECT doc_id, lang, $hbSql AS hb FROM documents),
        |c AS (SELECT lang, count(*) AS cnt FROM d GROUP BY 1),
        |m AS (SELECT min(cnt) AS mn FROM c)
        |SELECT doc_id, lang FROM d JOIN c USING (lang) CROSS JOIN m
        |WHERE hb * cnt < mn * 65536
        |ORDER BY doc_id""".stripMargin,
    "corpus_bucket_batches" -> {
      val powsList = (1 to LengthHistoMaxPow).map(i => 1L << i).mkString("[", ", ", "]")
      s"""WITH d AS (SELECT doc_id, $hbSql AS hb,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |b AS (SELECT doc_id, hb, n_tok,
        |        CAST(len(list_filter($powsList, p -> p <= n_tok)) AS BIGINT) AS bin
        |      FROM d),
        |p AS (SELECT *, row_number() OVER (PARTITION BY bin ORDER BY hb, doc_id) AS rn
        |      FROM b),
        |pb AS (SELECT bin, (rn - 1) // $BucketBatchSize AS batch, count(*) AS bn,
        |         max(n_tok) AS bmax, CAST(sum(n_tok) AS BIGINT) AS btok
        |       FROM p GROUP BY 1, 2)
        |SELECT bin, CAST(sum(bn) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_batches,
        |       CAST(sum(btok) AS BIGINT) AS n_tokens,
        |       CAST(sum(bmax * bn) AS BIGINT) AS n_padded,
        |       CAST((CAST(1000000 AS HUGEINT) * (sum(bmax * bn) - sum(btok)))
        |            // sum(bmax * bn) AS BIGINT) AS pad_ppm
        |FROM pb GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "corpus_dsir" ->
      s"""WITH $dsirCtes
        |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |       CAST(sum(score) AS BIGINT) AS score_sum
        |FROM doc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "corpus_dsir_apply" ->
      s"""WITH $dsirCtes
        |SELECT doc_id, source, lang, score FROM doc
        |WHERE score > 0 ORDER BY doc_id""".stripMargin,
    "corpus_sample" ->
      s"""SELECT doc_id, md5(text) AS fingerprint FROM documents
        |WHERE $hbSql % $SampleK = 0 ORDER BY doc_id""".stripMargin,
    "corpus_weighted_sample" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |         least(len(string_split(text, ' ')), $WeightCap) AS weight,
        |         $hbSql AS hb
        |  FROM documents)
        |SELECT doc_id, CAST(weight AS BIGINT) AS weight FROM d
        |WHERE hb * $WeightCap * $WeightRateDen < 65536 * weight * $WeightRateNum
        |ORDER BY doc_id""".stripMargin,
    "corpus_split" ->
      s"""WITH b AS (SELECT doc_id, CAST($hbSql % 100 AS BIGINT) AS bucket FROM documents)
        |SELECT doc_id, bucket,
        |       CASE WHEN bucket < $TrainPct THEN 'train'
        |            WHEN bucket < $ValPct THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "corpus_pack_batches" ->
      s"""WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
        |           FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |       CAST(coalesce(CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |            // $PackBudget AS BIGINT) AS batch
        |FROM t ORDER BY doc_id""".stripMargin,
    "corpus_pack_bpe" ->
      s"""WITH t AS (SELECT doc_id, lang, (strlen(text) + 3) // 4 AS n_tokens
        |           FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |       CAST(coalesce(CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |            // $PackBudget AS BIGINT) AS batch
        |FROM t ORDER BY doc_id""".stripMargin,
    "corpus_leakage" ->
      s"""WITH ${Dedup.minhashPairsCte},
        |sp AS (SELECT doc_id,
        |         CASE WHEN $hbSql % 100 < $TrainPct THEN 'train'
        |              WHEN $hbSql % 100 < $ValPct THEN 'val'
        |              ELSE 'test' END AS split
        |       FROM documents),
        |lk AS (SELECT a.split AS split_a, b.split AS split_b
        |       FROM est e
        |       JOIN sp a ON e.doc_a = a.doc_id
        |       JOIN sp b ON e.doc_b = b.doc_id
        |       WHERE e.est_jaccard >= $LeakJaccard AND a.split <> b.split)
        |SELECT split_a, split_b, count(*) AS n_pairs
        |FROM lk GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin,
    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_md5 FROM documents
        |           WHERE doc_id % 11 <> 0),
        |n AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS new_md5
        |      FROM documents WHERE doc_id % 13 <> 0),
        |j AS (SELECT doc_id,
        |        CASE WHEN old_md5 IS NULL THEN 'added'
        |             WHEN new_md5 IS NULL THEN 'removed'
        |             WHEN old_md5 <> new_md5 THEN 'changed' END AS status
        |      FROM o FULL OUTER JOIN n USING (doc_id))
        |SELECT doc_id, status FROM j WHERE status IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "corpus_contamination" ->
      s"""WITH f AS (SELECT doc_id,
        |             md5(array_to_string((string_split(text, ' '))[1:5], ' ')) AS head_md5
        |           FROM documents),
        |bench AS (SELECT head_md5 FROM f WHERE doc_id % $BenchMod = 0)
        |SELECT doc_id, head_md5 FROM f
        |WHERE doc_id % $BenchMod <> 0 AND head_md5 IN (SELECT head_md5 FROM bench)
        |ORDER BY doc_id""".stripMargin,
  )
}
