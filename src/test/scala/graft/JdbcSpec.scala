package graft

import org.apache.spark.sql.functions._

import graft.engine.{Tables, VotingQueries, VotingTables}
import graft.sources.VotingGen

/** End-to-end JDBC round-trip against EMBEDDED Derby — the only SQL
  * engine shipped in `/opt/spark/jars` — closing the reference's
  * Postgres read path (`app.py:51-63`) without a network database:
  * voting fixtures go out through `df.write.jdbc`, come back through
  * `Tables.fromJdbc` / `fromJdbcPartitioned`, and must be
  * row-identical to the in-memory originals; a reference query run
  * over the JDBC-backed tables must match the same query over the
  * originals. Derby quirks covered: CLOB-mapped strings round-trip,
  * unquoted table names uppercase on create and resolve back.
  */
class JdbcSpec extends SparkSpec {

  private val dbDir = java.nio.file.Files.createTempDirectory("graft-derby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"
  private def props = new java.util.Properties()

  private lazy val fixture: VotingTables =
    VotingGen.generate(spark, nVoters = 200, seed = 7L)

  // single writer JVM: written once, read by every test in declaration order
  private lazy val written: Unit = {
    fixture.candidate.write.jdbc(url, "candidate", props)
    fixture.voter.write.jdbc(url, "voter", props)
    fixture.vote.write.jdbc(url, "vote", props)
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).toSeq.sorted
  }

  test("voting fixtures round-trip Derby bit-identically (all three tables)") {
    written
    for ((name, orig) <- Seq(
        "candidate" -> fixture.candidate,
        "voter" -> fixture.voter,
        "vote" -> fixture.vote)) {
      val back = Tables.fromJdbc(spark, url, name, props)
      assert(back.columns.sorted.toSeq === orig.columns.sorted.toSeq, s"$name schema")
      assert(sortedRows(back) === sortedRows(orig), s"$name rows")
    }
  }

  test("a reference query over the JDBC source matches the in-memory path") {
    written
    val jdbcTables = VotingTables(
      Tables.fromJdbc(spark, url, "candidate", props),
      Tables.fromJdbc(spark, url, "voter", props),
      Tables.fromJdbc(spark, url, "vote", props))
    val got = sortedRows(VotingQueries.votesByCandidate(jdbcTables))
    val want = sortedRows(VotingQueries.votesByCandidate(fixture))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("partitioned JDBC scan shards by range and loses no rows") {
    written
    val sharded = Tables.fromJdbcPartitioned(spark, url, "voter",
      partitionColumn = "age", lowerBound = 18L, upperBound = 61L,
      numPartitions = 4, props)
    assert(sharded.rdd.getNumPartitions === 4)
    assert(sortedRows(sharded) === sortedRows(fixture.voter))
  }
}
