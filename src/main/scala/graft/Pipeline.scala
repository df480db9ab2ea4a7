package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, TextAnalysis}

/** The end-to-end training-data pipeline as one composition — the
  * user story the operator library exists for. Stages, in the order a
  * production corpus build runs them:
  *
  *  1. quality filter (`TextAnalysis.filterDocs` verdicts)
  *  2. exact-dup removal (keeper election, `Dedup.dedupApply` logic)
  *  3. decontamination (`Corpus.clean` — benchmark-colliding docs out)
  *  4. stratified language rebalance (`Corpus.stratified`)
  *  5. split assignment + token-budget batch packing
  *
  * Every stage is content-hash-deterministic, so the whole pipeline is
  * rerun-stable and resumable. [[run]] returns the final frame plus
  * per-stage survivor counts; the `Pipeline` main prints the funnel
  * and writes the packed corpus.
  */
object Pipeline {

  final case class StageCounts(stage: String, docs: Long)

  /** Run the pipeline over `dir`'s documents; returns (final frame,
    * stage funnel). The joins against per-stage keep-sets are all on
    * doc_id — at scale these are shuffle-on-key semi-joins, and every
    * stage's verdict logic is the library operator's own.
    */
  def run(spark: SparkSession, dir: String): (DataFrame, Seq[StageCounts]) = {
    import spark.implicits._
    val docs = graft.engine.Tables.load(spark, dir, "documents")
    val funnel = Seq.newBuilder[StageCounts]
    funnel += StageCounts("input", docs.count())

    // 1. quality verdicts
    val kept1 = TextAnalysis.filterDocs(spark, dir)
      .filter($"keep").select($"doc_id")
    val s1 = docs.join(kept1, Seq("doc_id"), "left_semi")
    funnel += StageCounts("quality_filter", s1.count())

    // 2. exact-dup keepers (same election as dedup_apply)
    val keepers = s1.select($"doc_id", md5($"text").as("fp"))
      .groupBy($"fp").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val s2 = s1.join(keepers, Seq("doc_id"), "left_semi")
    funnel += StageCounts("exact_dedup", s2.count())

    // 3. decontamination
    val s3 = s2.join(Corpus.clean(spark, dir).select($"doc_id"),
      Seq("doc_id"), "left_semi")
    funnel += StageCounts("decontaminate", s3.count())

    // 4. stratified rebalance
    val s4 = s3.join(Corpus.stratified(spark, dir).select($"doc_id"),
      Seq("doc_id"), "left_semi")
    funnel += StageCounts("stratify", s4.count())

    // 5. split + packing metadata on the survivors
    val split = Corpus.splitAssign(spark, dir).select($"doc_id", $"split")
    val packed = Corpus.packBatches(spark, dir)
      .select($"doc_id", $"n_tokens", $"batch")
    val out = s4.join(split, Seq("doc_id")).join(packed, Seq("doc_id"))
      .select($"doc_id", $"lang", $"source", $"split", $"n_tokens", $"batch")
    funnel += StageCounts("packed", out.count())
    (out, funnel.result())
  }

  /** CLI: `runMain graft.Pipeline [sfDir] [outDir]` — prints the
    * funnel and writes the packed corpus partitioned by split.
    */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.drop(1).headOption.getOrElse("/tmp/graft-pipeline-out")
    val spark = graft.engine.Tables.session("local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    val (df, funnel) = run(spark, dir)
    funnel.foreach(s => println(f"${s.stage}%-16s ${s.docs}%7d docs"))
    df.write.mode("overwrite").partitionBy("split").parquet(out)
    println(s"packed corpus -> $out")
    spark.stop()
  }
}
