package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Batch twins of the reference's declared streaming aggregations
  * (`README.md:116-118`, report §3.3: tumbling + sliding windows;
  * per-candidate totals and per-location turnout). Structured
  * Streaming's batch/stream parity means these exact plans, run by
  * graft.streaming.EventStreams over an unbounded source, produce the
  * same rows — which is what the ScalaTest suite asserts.
  */
object WindowedEvents {

  /** Tumbling 1-hour window per event type —
    * `aggregated_votes_per_candidate` (`README.md:116-117`).
    */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("window_start"), $"window.end".as("window_end"),
        $"event_type", $"cnt")
      .orderBy($"window_start", $"event_type")
  }

  /** Sliding 1-hour window, 30-minute slide (report §3.3 "sliding and
    * tumbling intervals") — each event lands in exactly two windows.
    */
  def slidingHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select($"window.start".as("window_start"), $"window.end".as("window_end"),
        $"event_type", $"cnt")
      .orderBy($"window_start", $"event_type")
  }

  /** Turnout by location (`aggregated_turnout_by_location`,
    * `README.md:118`): tumbling daily window × nation of the acting
    * user (events.user_id ⋈ customer ⋈ nation per FIXTURES.md).
    */
  def turnoutByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .join(Tables.load(spark, dir, "customer"), $"user_id" === $"c_custkey")
      .join(broadcast(Tables.load(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy(window($"ts", "1 day"), $"n_name")
      .agg(count(lit(1)).as("turnout"))
      .select($"window.start".as("window_start"), $"window.end".as("window_end"),
        $"n_name".as("nation"), $"turnout")
      .orderBy($"window_start", $"nation")
  }

  /** The `unique_voter` dedup semantics (`src/setup_database.py:105`,
    * SURVEY §2.5-6) made deterministic: first event per user by
    * (ts, event_id). Streaming form: dropDuplicates("user_id") under a
    * watermark; this batch twin pins which row survives.
    */
  def firstEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("rn",
        row_number().over(Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .orderBy($"user_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_tumbling_hourly" -> tumblingHourly _,
    "s_sliding_hourly" -> slidingHourly _,
    "s_turnout_by_nation" -> turnoutByNation _,
    "s_first_event_per_user" -> firstEventPerUser _,
  )

  val oracle: Map[String, String] = Map(
    "s_tumbling_hourly" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |       event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,
    "s_sliding_hourly" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS b30, event_type FROM events),
        |s AS (
        |  SELECT b30 AS window_start, event_type FROM b
        |  UNION ALL
        |  SELECT b30 - INTERVAL 30 MINUTE, event_type FROM b)
        |SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
        |       event_type, count(*) AS cnt
        |FROM s GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,
    "s_turnout_by_nation" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |       CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
        |       n_name AS nation, count(*) AS turnout
        |FROM events JOIN customer ON user_id = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2, 3 ORDER BY window_start, nation""".stripMargin,
    "s_first_event_per_user" ->
      """SELECT user_id, event_id, ts, event_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
  )
}
