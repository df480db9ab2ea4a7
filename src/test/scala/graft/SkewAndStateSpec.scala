package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.engine.{VotingQueries => VQ}
import graft.operators.Skew
import graft.sources.VotingGen
import graft.streaming.EventStreams

class SkewAndStateSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i <= 1800) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1900", "A"), ("k1999", "B")).toDF("key", "tag")
    val plain = big.join(small, "key").groupBy($"key", $"tag")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"key").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(big, small, "key", buckets = 8)
      .groupBy($"key", $"tag")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"key").collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }

  test("eventPaths caps a hot user's journey but reports the true count") {
    import spark.implicits._
    import java.sql.Timestamp
    val events = (1 to 50).map { i =>
      (Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), i.toLong, "hot", s"t${i % 3}")
    } ++ Seq(
      (Timestamp.valueOf("2024-01-01 01:00:00"), 100L, "cold", "t0"),
      (Timestamp.valueOf("2024-01-01 01:01:00"), 101L, "cold", "t1"))
    val df = events.toDF("ts", "event_id", "user_id", "event_type")
    val rows = graft.operators.WindowedEvents.eventPathsOf(df, cap = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val (hotN, hotPath) = rows("hot")
    assert(hotN === 50L, "n_events must report the uncapped count")
    assert(hotPath.split(">").length === 10, "path must hold only the first cap events")
    // first 10 events by (ts, event_id): ts ordering is i%60 minutes
    val expected = (1 to 50).map(i => (i % 60, i)).sorted.take(10)
      .map { case (_, i) => s"t${i % 3}" }.mkString(">")
    assert(hotPath === expected)
    assert(rows("cold") === ((2L, "t0>t1")))
  }

  test("keyProfile ranks the true top keys with exact integer shares") {
    val events = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val counts = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val nKeys = counts.size.toLong
    val expectedTop = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(20)
    val got = Skew.keyProfile(events, "user_id", 20).collect()
    assert(got.length == math.min(20, nKeys.toInt))
    got.zip(expectedTop).zipWithIndex.foreach { case ((r, (k, c)), i) =>
      assert(r.getLong(0) == i + 1, "rank is dense from 1")
      assert(r.getLong(1) == k && r.getLong(2) == c, s"rank ${i + 1} key")
      assert(r.getLong(3) == c * 1000000L / total, "share_ppm")
      assert(r.getLong(4) == c * nKeys * 1000000L / total, "x_mean_ppm")
    }
  }

  test("retention cohorts equal a driver recompute over (user, week)") {
    val pairs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000 AS week")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val cohort = pairs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = pairs.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val got = graft.operators.WindowedEvents.retentionCohorts(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    // offset 0 exists for every cohort (the cohort's own first week)
    got.keys.map(_._1).foreach(c => assert(got.contains((c, 0L))))
  }

  test("DAU/WAU equals a driver recompute of trailing-7-day distinct users") {
    val pairs = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byDay = pairs.groupBy(_._2)
    val got = graft.operators.WindowedEvents.dauWau(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === byDay.keySet)
    byDay.keys.foreach { d =>
      val dau = byDay(d).map(_._1).distinct.size.toLong
      val wau = pairs.filter { case (_, x) => x >= d - 6 && x <= d }.map(_._1).distinct.size.toLong
      assert(got(d) === ((dau, wau, dau * 1000000L / wau)), s"day $d")
      assert(wau >= dau)
    }
  }

  test("salted count equals plain groupBy count") {
    import spark.implicits._
    val df = (1 to 5000).map(i => if (i % 10 == 0) s"k${i % 50}" else "hot")
      .toDF("key")
    val plain = df.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "key", buckets = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("stateful running tallies accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def msg(i: Int, cand: String, at: String) =
      s"""{"vote_id":"t$i","voter_id":"v$i","voter_name":"V","candidate_id":"$cand",""" +
        s""""candidate_name":"C","party":"P","voted_at":"$at","vote":1}"""
    val stream = MemoryStream[String]
    val tallies = EventStreams.runningTallies(
      EventStreams.parseVotes(stream.toDF()))
    val q = tallies.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("tallies")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-st").toString)
      .start()
    stream.addData(Seq(
      msg(1, "c1", "2024-05-01 10:00:00"), msg(2, "c1", "2024-05-01 10:01:00"),
      msg(3, "c2", "2024-05-01 10:02:00")))
    q.processAllAvailable()
    stream.addData(Seq(msg(4, "c1", "2024-05-01 10:03:00")))
    q.processAllAvailable()
    q.stop()
    // memory sink in update mode: last emitted row per key wins
    val last = spark.table("tallies")
      .groupBy($"candidate_id").agg(max($"total_votes").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last === Map("c1" -> 3L, "c2" -> 1L))
  }

  test("geo merge keeps all 50 states; active-states metric counts Q4a rows") {
    val t = VotingGen.generate(spark, nVoters = 300, seed = 11)
    val q4a = VQ.votesByState(t)
    val merged = VQ.geoMerge(VQ.usStates(spark), q4a)
    assert(merged.count() === 50)
    assert(merged.filter("vote_count IS NULL").count() === 50 - VQ.activeStates(q4a))
    // every state with votes carried its counts through the merge
    assert(merged.filter("vote_count IS NOT NULL").count() === VQ.activeStates(q4a))
  }

  test("sessionize and native session_window agree at the exact 30-minute boundary") {
    import spark.implicits._
    // events at exactly gap distance MERGE in native session_window;
    // the lag/cumsum form must use strict > to match
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    def ns(t: String): Long = java.sql.Timestamp.valueOf(t).getTime * 1000000L
    Seq(
      (0L, ns("2024-05-01 10:00:00"), 1L, "click", 0.0, "{}"),
      (1L, ns("2024-05-01 10:30:00"), 1L, "click", 0.0, "{}"), // exactly at session end
      (2L, ns("2024-05-01 11:00:01"), 1L, "click", 0.0, "{}")) // 1s past -> new session
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val a = graft.operators.WindowedEvents.sessionize(spark, dir)
      .select("user_id", "n_events").collect().map(_.toSeq).toSeq
    val b = graft.operators.WindowedEvents.sessionWindow(spark, dir)
      .select("user_id", "n_events").collect().map(_.toSeq).toSeq
    assert(a === Seq(Seq(1L, 2L), Seq(1L, 1L)))
    assert(b === a)
  }
}
