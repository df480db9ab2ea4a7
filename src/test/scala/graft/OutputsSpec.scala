package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.engine.{VotingQueries => VQ}
import graft.sinks.Outputs
import graft.sources.VotingGen

class OutputsSpec extends SparkSpec {

  test("CSV export round-trips the Q2 leaderboard in the golden column shape") {
    val t = VotingGen.generate(spark, nVoters = 200, seed = 3)
    val q2 = VQ.votesByCandidate(t)
    // golden shape per docs/cvs-sample.csv: first_name,last_name,party,
    // vote_count,percentage,rank,hourly_change
    assert(q2.columns.toSeq === Seq("first_name", "last_name", "party",
      "vote_count", "percentage", "rank", "hourly_change"))
    val path = Files.createTempDirectory("graft-csv").toString + "/q2"
    Outputs.csvExport(q2, path)
    val schema = StructType(Seq(
      StructField("first_name", StringType), StructField("last_name", StringType),
      StructField("party", StringType), StructField("vote_count", LongType),
      StructField("percentage", DoubleType), StructField("rank", IntegerType),
      StructField("hourly_change", LongType)))
    val back = Outputs.readCsv(spark, path, schema)
    assert(back.orderBy("rank").collect().map(_.toSeq).toSeq ===
      q2.orderBy("rank").collect().map(_.toSeq).toSeq)
  }

  test("JSON lines round-trip the vote message shape") {
    val t = VotingGen.generate(spark, nVoters = 50, seed = 5)
    val path = Files.createTempDirectory("graft-json").toString + "/votes"
    Outputs.jsonLines(t.vote, path)
    val back = Outputs.readJsonLines(spark, path, t.vote.schema)
    assert(back.count() === 50)
    assert(back.orderBy("vote_id").collect().map(_.toSeq).toSeq ===
      t.vote.orderBy("vote_id").collect().map(_.toSeq).toSeq)
  }

  test("ORC round-trips votes and pushes filters to the scan") {
    val t = VotingGen.generate(spark, nVoters = 50, seed = 7)
    val path = Files.createTempDirectory("graft-orc").toString + "/votes"
    Outputs.orcWrite(t.vote, path)
    val back = Outputs.readOrc(spark, path)
    assert(back.orderBy("vote_id").collect().map(_.toSeq).toSeq ===
      t.vote.orderBy("vote_id").collect().map(_.toSeq).toSeq)
    // columnar behavior parity with parquet: predicate reaches the scan
    val plan = back.filter("candidate_id = 'c1'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("candidate_id"),
      s"no pushdown on ORC scan:\n$plan")
  }

  test("approx distinct users tracks exact counts within the configured error") {
    // surfaced rows: (event_type, distinct_users exact, est_in_bound) —
    // the exact column must match the exact query and every bound flag
    // must hold (the invariant the DuckDB oracle now hash-pins)
    val exact = graft.operators.CoreQueries.distinctUsers(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.operators.CoreQueries.approxDistinctUsers(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, v) =>
      assert(approx(k)._1 === v, s"$k: exact column drifted")
      assert(approx(k)._2, s"$k: estimate outside 10% of exact $v")
    }
  }
}
