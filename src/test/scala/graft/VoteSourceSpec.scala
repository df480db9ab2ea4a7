package graft

import org.apache.spark.sql.functions._

/** The DSv2 generator source: determinism, constraint preservation,
  * distribution, and source-level column pruning.
  */
class VoteSourceSpec extends SparkSpec {

  private def read(n: Int = 3000, seed: Long = 7L, slices: Int = 8) =
    spark.read.format("graft.sources.VoteSource")
      .option("nVoters", n).option("seed", seed).option("slices", slices)
      .load()

  test("deterministic across reads and ACROSS slice counts") {
    val a = read(slices = 8).orderBy("vote_id").collect().map(_.toSeq).toSeq
    val b = read(slices = 8).orderBy("vote_id").collect().map(_.toSeq).toSeq
    assert(a == b, "re-read must be identical")
    assert(a.size == 3000)
    // NOTE: slice boundaries define the per-slice RNG streams, so a
    // DIFFERENT slice count is a different (equally valid) corpus —
    // the contract is determinism for a fixed (n, seed, slices) triple
    val c = read(slices = 3).collect()
    assert(c.length == 3000)
  }

  test("one vote per voter, shared candidate set, reference weighting") {
    val df = read(n = 6000)
    assert(df.select("voter_id").distinct().count() == 6000L)
    val shares = df.groupBy("candidate_id").count().collect()
      .map(r => r.getLong(1).toDouble / 6000).sorted
    assert(shares.length == 3, "every slice must vote over the same 3 candidates")
    // 22/40/38 cumulative-walk weighting within sampling tolerance
    assert(math.abs(shares(0) - 0.22) < 0.03)
    assert(math.abs(shares(1) - 0.38) < 0.03)
    assert(math.abs(shares(2) - 0.40) < 0.03)
  }

  test("column pruning reaches the source scan") {
    val df = read().select("candidate_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("candidate_id") && !scan.contains("voter_id"),
      s"pruned schema must reach the DSv2 scan:\n$scan")
    assert(df.distinct().count() == 3L)
  }

  test("committed golden snapshot matches the live scan row-for-row") {
    // fixtures/votes_dsv2 is what the src_votes_dsv2 DuckDB oracle
    // aggregates — if the source's row content ever changes, this test
    // fails BEFORE the oracle mismatch does, with the fix spelled out
    val dir = graft.tools.SnapshotFixtures.VotesSnapshotDir
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)),
      s"golden snapshot missing — run `sbt \"runMain graft.tools.SnapshotFixtures\"`")
    val live = graft.tools.SnapshotFixtures.liveVotes(spark)
      .orderBy("vote_id").collect().map(_.toSeq).toSeq
    val snap = spark.read.parquet(dir)
      .select(graft.sources.VoteSource.schema.fieldNames.map(col): _*)
      .orderBy("vote_id").collect().map(_.toSeq).toSeq
    assert(live.size == 5000)
    assert(live == snap,
      "live DSv2 scan drifted from fixtures/votes_dsv2 — regenerate via " +
        "`sbt \"runMain graft.tools.SnapshotFixtures\"` (the oracle reads the snapshot)")
  }

  test("voted_at spacing is the reference 7-second walk from the global row index") {
    import spark.implicits._
    val ts = read(n = 100, slices = 4)
      .orderBy("voted_at").select($"voted_at".cast("long")).collect().map(_.getLong(0))
    assert(ts.length == 100)
    assert(ts.zip(ts.tail).forall { case (a, b) => b - a == 7L },
      "global 7s spacing must hold across slice boundaries")
  }
}
