package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.engine.{VotingQueries => VQ, VotingTables}
import graft.sources.VotingGen

/** Hand-computed expectations over a 6-vote fixture, one test per
  * reference query, with dedicated regressions for the faithful-quirk
  * register (SURVEY §2.5) so nobody "fixes" them into disagreement.
  */
class VotingQueriesSpec extends SparkSpec {
  import VotingGen.{Candidate, Vote, Voter}

  private def ts(s: String) = Timestamp.valueOf(s)

  lazy val fixture: VotingTables = {
    import spark.implicits._
    val candidates = Seq(
      Candidate("c1", "Alice", "Smith", "1970-01-01", 54, "male", "Management Party", "bio1", "img1"),
      Candidate("c2", "Bob", "Jones", "1971-01-01", 53, "female", "Liberation Party", "bio2", "img2"),
      Candidate("c3", "Carol", "White", "1972-01-01", 52, "female", "United Republic Party", "bio3", "img3"))
    def voter(id: String, age: Int, gender: String, state: String) =
      Voter(id, "F" + id, "L" + id, "1990-01-01", age, gender, "US", "R" + id,
        "1 St", "City", state, "United States", "00000", id + "@x", "555")
    val voters = Seq(
      voter("v1", 25, "male", "Texas"),
      voter("v2", 35, "female", "Texas"),
      voter("v3", 50, "male", "Ohio"),
      voter("v4", 61, "male", "Ohio"),
      voter("v5", 29, "female", "Maine"),
      voter("v6", 44, "female", "Maine"))
    val votes = Seq(
      Vote("t1", "v1", "c1", ts("2024-05-01 10:05:00"), 1),
      Vote("t2", "v2", "c2", ts("2024-05-01 10:10:00"), 1),
      Vote("t3", "v3", "c2", ts("2024-05-01 11:01:00"), 1),
      Vote("t4", "v4", "c2", ts("2024-05-01 11:30:00"), 1),
      Vote("t5", "v5", "c1", ts("2024-05-01 11:45:00"), 1),
      Vote("t6", "v6", "c2", ts("2024-05-01 12:20:00"), 1))
    VotingTables(candidates.toDF(), voters.toDF(), votes.toDF())
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("Q1 total_votes is the LATEST HOUR's count, not the global total (quirk 1)") {
    val r = rows(VQ.totalVotes(fixture))
    assert(r === Seq(Seq(1L, ts("2024-05-01 12:20:00"), -2L)))
  }

  test("Q2 leaderboard: counts, rounded percentage, rank, single-row hourly change (quirk 2)") {
    val r = rows(VQ.votesByCandidate(fixture))
    assert(r === Seq(
      Seq("Bob", "Jones", "Liberation Party", 4L, 66.67, 1, -1L),
      Seq("Alice", "Smith", "Management Party", 2L, 33.33, 2, 0L)))
  }

  test("Q3 historical trends: cumulative counts per candidate per minute") {
    val r = VQ.historicalTrends(fixture)
    val bobFinal = r.filter("candidate_name = 'Bob Jones' and vote_time = timestamp'2024-05-01 12:20:00'")
      .select("total_votes").collect().map(_.getLong(0)).toSeq
    assert(bobFinal === Seq(4L))
    // cumulative counts are monotone per candidate
    val perCand = r.orderBy("vote_time").collect()
      .groupBy(_.getAs[String]("candidate_name"))
      .view.mapValues(_.map(_.getAs[Long]("total_votes")).toSeq)
    perCand.foreach { case (_, xs) => assert(xs === xs.sorted) }
  }

  test("Q3 merges same-name candidates per minute with MAX, like the reference's name grouping") {
    import spark.implicits._
    val twins = Seq(
      Candidate("c1", "Bob", "Jones", "1970-01-01", 54, "male", "Liberation Party", "b", "i"),
      Candidate("c2", "Bob", "Jones", "1971-01-01", 53, "male", "Liberation Party", "b", "i"))
    val votes = Seq(
      Vote("t1", "v1", "c1", ts("2024-05-01 10:00:10"), 1),
      Vote("t2", "v2", "c1", ts("2024-05-01 10:00:20"), 1),
      Vote("t3", "v3", "c2", ts("2024-05-01 10:00:30"), 1))
    val t = VotingTables(twins.toDF(), fixture.voter, votes.toDF())
    val r = rows(VQ.historicalTrends(t))
    // one row for the shared minute: MAX(c1's cumulative 2, c2's cumulative 1)
    assert(r === Seq(Seq(ts("2024-05-01 10:00:00"), "Bob Jones", "Liberation Party", 2L)))
  }

  test("Q4a votes by state with sorted string_agg(DISTINCT)") {
    val r = rows(VQ.votesByState(fixture).orderBy("address_state"))
    assert(r === Seq(
      Seq("Maine", 2L, "Liberation Party, Management Party"),
      Seq("Ohio", 2L, "Liberation Party"),
      Seq("Texas", 2L, "Liberation Party, Management Party")))
  }

  test("Q4b leading party keeps RANK ties — tied states yield 2 rows (quirk 7)") {
    val r = VQ.leadingPartyByState(fixture)
    assert(r.filter("address_state = 'Texas'").count() === 2)
    assert(r.filter("address_state = 'Ohio'").count() === 1)
    assert(r.count() === 5)
  }

  test("Q5a gender distribution") {
    val r = rows(VQ.genderDistribution(fixture).orderBy("gender"))
    assert(r === Seq(Seq("female", 3L, 50.0), Seq("male", 3L, 50.0)))
  }

  test("Q5b age buckets with boundary ages and grand-total percentage") {
    val r = rows(VQ.ageDistribution(fixture))
    assert(r === Seq(
      Seq("18-29", 2L, 33.33),
      Seq("30-44", 2L, 33.33),
      Seq("45-59", 1L, 16.67),
      Seq("60+", 1L, 16.67)))
  }

  test("Q6 candidate info projection") {
    val r = VQ.candidateInfo(fixture)
    assert(r.columns.toSeq ===
      Seq("first_name", "last_name", "party", "age", "gender", "biography", "img_url"))
    assert(r.count() === 3)
  }

  test("Q7 state details: manual pivot, COALESCE(0), divide-by-3 quirk (quirk 3)") {
    val r = rows(VQ.stateVotingDetails(fixture))
    assert(r === Seq(
      // Maine: M=1 (v5: 29 f), L=1 (v6: 44 f), U=0 → AvgAge=(29+44+0)/3, Male%=0
      Seq("Maine", 1L, 1L, 0L, 2L, 24.3, 0.0),
      // Ohio: L=2 (v3 50 m, v4 61 m → avg 55.5, male 100) → (0+55.5+0)/3
      Seq("Ohio", 0L, 2L, 0L, 2L, 18.5, 33.3),
      // Texas: M=1 (v1 25 m), L=1 (v2 35 f) → (25+35+0)/3=20, (100+0+0)/3=33.3
      Seq("Texas", 1L, 1L, 0L, 2L, 20.0, 33.3)))
  }

  test("Q8 candidate image lookup by exact name filter") {
    assert(rows(VQ.candidateImage(fixture, "Bob", "Jones")) === Seq(Seq("img2")))
  }

  test("generator stats: zero-vote candidate still counts 1 via LEFT JOIN COUNT(*) (quirk 4)") {
    val r = rows(VQ.generatorStats(fixture))
    // c2=4, c1=2, c3=1 (null-extended row); total=7
    assert(r === Seq(
      Seq("Bob", "Jones", "Liberation Party", 4L, 57.14),
      Seq("Alice", "Smith", "Management Party", 2L, 28.57),
      Seq("Carol", "White", "United Republic Party", 1L, 14.29)))
  }

  test("post-op: party rollup over Q2 output") {
    val r = rows(VQ.partyRollup(VQ.votesByCandidate(fixture)).orderBy("party"))
    assert(r === Seq(
      Seq("Liberation Party", 4L),
      Seq("Management Party", 2L)))
  }

  test("post-op: case-insensitive state search") {
    val q7 = VQ.stateVotingDetails(fixture)
    assert(VQ.stateSearch(q7, "tex").count() === 1)
    assert(VQ.stateSearch(q7, "A").count() === 2) // Maine, Texas
  }

  test("generator: deterministic, one vote per voter, ~22/40/38 shares (quirk 5)") {
    val t1 = VotingGen.generate(spark, nVoters = 1000, seed = 7)
    val t2 = VotingGen.generate(spark, nVoters = 1000, seed = 7)
    assert(t1.vote.count() === 1000)
    assert(t1.vote.select("voter_id").distinct().count() === 1000)
    assert(rows(t1.vote.orderBy("vote_id")) === rows(t2.vote.orderBy("vote_id")))
    val shares = VQ.generatorStats(t1).collect().map(r =>
      r.getAs[String]("party") -> r.getAs[Long]("vote_count")).toMap
    assert(shares("Liberation Party") > shares("United Republic Party"))
    assert(shares("United Republic Party") > shares("Management Party"))
  }

  test("generator: weighted fall-through sends r>0.97 to the last candidate (quirk 5)") {
    assert(VotingGen.weightedIndex(0.10) === 0)
    assert(VotingGen.weightedIndex(0.50) === 1)
    assert(VotingGen.weightedIndex(0.80) === 2)
    assert(VotingGen.weightedIndex(0.99) === 2)
  }
}
