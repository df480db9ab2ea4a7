package graft

import graft.engine.{VotingQueries => VQ}
import graft.sources.VotingGen
import graft.streaming.EventStreams

/** Thin CLI standing in for the reference's Streamlit dashboard
  * (SURVEY §7.6: rendering is out of engine scope; the engine's API
  * ends at DataFrames). Generates a seeded electorate, runs every
  * dashboard query, and replays the votes through the streaming
  * topology.
  *
  * Usage: `sbt "runMain graft.Dashboard [nVoters] [seed]"`
  */
object Dashboard {
  def main(args: Array[String]): Unit = {
    val nVoters = args.headOption.map(_.toInt).getOrElse(5000)
    val seed = args.drop(1).headOption.map(_.toLong).getOrElse(42L)
    val spark = graft.engine.Tables.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val t = VotingGen.generate(spark, nVoters = nVoters, seed = seed)
    val q2 = VQ.votesByCandidate(t)

    println(s"=== graft voting dashboard (n=$nVoters, seed=$seed) ===")
    println("\n-- Q1 total votes (latest hour) --"); VQ.totalVotes(t).show(false)
    println("-- Q2 leaderboard --"); q2.show(false)
    println("-- leader --"); VQ.leader(q2).show(false)
    println("-- party rollup --"); VQ.partyRollup(q2).show(false)
    println("-- Q3 historical trends (tail) --")
    VQ.historicalTrends(t).orderBy($"vote_time".desc).limit(5).show(false)
    println("-- Q4a votes by state --"); VQ.votesByState(t).orderBy($"address_state").show(false)
    println("-- Q4b leading party per state --")
    VQ.leadingPartyByState(t).orderBy($"address_state").show(false)
    println("-- Q5a gender --"); VQ.genderDistribution(t).show(false)
    println("-- Q5b age buckets --"); VQ.ageDistribution(t).show(false)
    println("-- Q7 state details --"); VQ.stateVotingDetails(t).show(50, false)
    println("-- generator stats --"); VQ.generatorStats(t).show(false)

    println("-- streaming replay: aggregated_votes_per_candidate --")
    val replay = EventStreams.toKafkaShape(
      t.vote.join(t.candidate, "candidate_id")
        .select($"vote_id", $"voter_id",
          org.apache.spark.sql.functions.concat_ws(" ", $"first_name", $"last_name")
            .as("candidate_name"),
          $"candidate_id", $"party", $"voted_at", $"vote"),
      org.apache.spark.sql.functions.col("vote_id"))
    EventStreams.votesPerCandidate(EventStreams.parseVotes(replay))
      .orderBy("window_start", "candidate_id").show(10, false)

    spark.stop()
  }
}
