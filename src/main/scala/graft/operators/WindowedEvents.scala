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

  /** Ranked slots per window in [[trendingHourly]]. */
  val TrendingK = 3

  /** Per-hour TRENDING top-k event types — [[tumblingHourly]]'s
    * counts re-ranked inside each closed window (count desc, type asc
    * — a total order, so ties cannot break differently across
    * engines). The rank step is
    * [[graft.streaming.EventStreams.rankClosedWindows]], SHARED with
    * the streaming sink's foreachBatch body: windows close at the
    * watermark and re-rank downstream, so the live ranking and this
    * backfill are the same code path by construction (parity spec).
    * The rank filter compiles to WindowGroupLimit — map-side k-heaps
    * per hour, never a global sort.
    */
  def trendingHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.streaming.EventStreams.rankClosedWindows(tumblingHourly(spark, dir))
      .orderBy($"window_start", $"rnk")
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

  /** Gap-based sessionization via lag + running sum (the portable
    * form): a new session starts when the gap to the previous event
    * EXCEEDS 30 minutes. The strict `>` matches Spark's native
    * session_window, which MERGES an event landing exactly at the
    * previous session's end (empirically verified — `>=` would split
    * there and diverge from s_session_window on exact boundaries).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val lagTs = lag($"ts", 1).over(w)
    Tables.load(spark, dir, "events")
      .withColumn("new_sess",
        when(lagTs.isNull || $"ts" > lagTs + expr("INTERVAL 30 MINUTE"), 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum($"new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"), max($"ts").as("session_end"))
      .orderBy($"user_id", $"sess_id")
  }

  /** The same sessions through Spark's native session_window — the
    * streaming-capable form (merging windows in the state store).
    */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"session_window.start".as("window_start"),
        $"session_window.end".as("window_end"), $"user_id", $"n_events")
      .orderBy($"user_id", $"window_start")
  }

  /** Signup → purchase conversion funnel: per-user first signup, first
    * purchase at-or-after it, corpus-level conversion rate.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
    // single pass: one signup aggregate, one left join against
    // purchases, both counts from one final aggregation (no
    // double-planned signup subtree)
    val signups = events.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
    signups
      .join(events.filter($"event_type" === "purchase")
        .select($"user_id".as("pu"), $"ts".as("pts")),
        $"pu" === $"user_id" && $"pts" >= $"signup_ts", "left")
      .groupBy($"user_id")
      .agg(max($"pts".isNotNull.cast("long")).as("conv"))
      .agg(count(lit(1)).as("n_signup_users"), sum($"conv").as("n_converted"))
      .withColumn("conversion_pct", $"n_converted" * lit(100.0) / $"n_signup_users")
  }

  /** Per-user journey endpoints via argmin/argmax aggregates
    * (min_by/max_by): first and last event type plus active span — one
    * aggregation pass, no window, no self-join. Ties are impossible
    * (event timestamps are globally unique), so the arg-aggregates are
    * deterministic.
    */
  def userFirstLast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        min_by($"event_type", $"ts").as("first_type"),
        max_by($"event_type", $"ts").as("last_type"),
        (unix_micros(max($"ts").cast("timestamp"))
          - unix_micros(min($"ts").cast("timestamp"))).as("span_micros"))
      .orderBy($"user_id")
  }

  /** Weekly cohort retention — the classic product-analytics matrix
    * (cohort = the week of a user's FIRST event; cell (cohort, k) =
    * distinct users of that cohort active k weeks later). Weeks are
    * exact integer indices (`unix_micros div µs-per-week`), so every
    * cell is engine-exact. Shapes: user-keyed min for the cohort, the
    * distinct (user, week) activity set, one user-keyed join
    * (co-partitioned with the first aggregate's exchange), and the
    * final (cohort, offset)-keyed countDistinct — nothing bounded-key,
    * no window, no driver state.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weeks = Tables.load(spark, dir, "events")
      .select($"user_id",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000").as("week"))
    val first = weeks.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    weeks.distinct()
      .join(first, "user_id")
      .withColumn("week_offset", $"week" - $"cohort_week")
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** DAU / trailing-7-day WAU engagement series — the stickiness
    * metric (DAU/WAU) computed EXACTLY without a distinct-over-window
    * (which would re-scan 7 days per day): each distinct (user, day)
    * activity contributes itself to the 7 days it keeps the user
    * "weekly active" for (a 7× map-side expansion — the standard
    * dual of the sliding window), and one day-keyed countDistinct
    * folds the expansion. Day indices are exact integers; the ratio is
    * exact ppm. Only days with any activity report DAU; the WAU spine
    * is trimmed to observed days via the semi-join.
    */
  def dauWau(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val userDays = Tables.load(spark, dir, "events")
      .select($"user_id",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day"))
      .distinct()
    val dau = userDays.groupBy($"day").agg(countDistinct($"user_id").as("dau"))
    val wau = userDays
      .select($"user_id", explode(expr("sequence(day, day + 6)")).as("day"))
      .groupBy($"day").agg(countDistinct($"user_id").as("wau"))
      .join(dau.select($"day"), Seq("day"), "left_semi")
    dau.join(wau, "day")
      .withColumn("stickiness_ppm",
        expr("CAST(dau AS DECIMAL(19,0)) * 1000000 div wau"))
      .select($"day", $"dau", $"wau", $"stickiness_ppm")
      .orderBy($"day")
  }

  /** Per-user journey cap: a degenerate power-user key must not
    * materialise an unbounded array in one task, so [[eventPaths]]
    * only ever collects the first MaxPathEvents events of a user (the
    * true event count is still reported).
    */
  val MaxPathEvents = 1000

  /** Per-user ordered event-type path (the sequence-modeling /
    * user-journey prep op), rendered as a '>'-joined string.
    *
    * The per-user rank filter runs BEFORE the collect: the window sort
    * is a spillable (user, ts) sort shared across users in a task, and
    * the collected array is bounded at [[MaxPathEvents]] structs per
    * user — collecting everything and slicing afterwards would still
    * hold the whole journey of a hot key in one row. `n_events` keeps
    * the uncapped count from a same-partition window (no extra
    * shuffle — both windows ride one exchange on user_id).
    */
  def eventPaths(spark: SparkSession, dir: String): DataFrame =
    eventPathsOf(Tables.load(spark, dir, "events"), MaxPathEvents)

  /** [[eventPaths]] over an arbitrary events frame with an explicit
    * cap (spec seam).
    */
  def eventPathsOf(events: DataFrame, cap: Int): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"user_id")))
      .filter($"rn" <= cap)
      .groupBy($"user_id")
      .agg(max($"cnt").cast("long").as("n_events"),
        collect_list(struct($"rn", $"event_type")).as("evs"))
      .select($"user_id", $"n_events",
        array_join(expr("transform(array_sort(evs), x -> x.event_type)"), ">")
          .as("path"))
      .orderBy($"user_id")
  }

  /** EVENT-TRANSITION matrix — the first-order Markov step behind
    * every "what do users do next" product question and behind
    * sequence-model training-data QA (a transition that never occurs
    * in the corpus can't be learned): per (src, dst) adjacent-event
    * pair within a user's ts-ordered stream, the count and its share
    * of the source type's outgoing transitions in ppm.
    *
    * Scale shape: one user-partitioned LEAD (the sessionize shuffle),
    * then a (src, dst) aggregate whose result is |types|² rows —
    * metadata; the per-source totals aggregate THAT and broadcast
    * back. Ties inside a user's stream break on event_id, the corpus
    * convention.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables.load(spark, dir, "events")
      .withColumn("dst", lead($"event_type", 1).over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .filter($"dst".isNotNull)
      .groupBy($"event_type".as("src_type"), $"dst".as("dst_type"))
      .agg(count(lit(1)).as("n_trans"))
    val tot = t.groupBy($"src_type").agg(sum($"n_trans").as("tot"))
    t.join(broadcast(tot), Seq("src_type"))
      .withColumn("share_ppm", expr("n_trans * 1000000 div tot"))
      .select($"src_type", $"dst_type", $"n_trans", $"share_ppm")
      .orderBy($"src_type", $"dst_type")
  }

  /** AUDIENCE-OVERLAP matrix — per event-type pair, how many distinct
    * users do BOTH, with each side's audience size and the Jaccard in
    * ppm: the cohort-intersection table behind "are error-ers also
    * signup-ers", feature-cooccurrence QA, and dataset-slice overlap
    * audits. Exact (the theta-sketch verb before sketches are
    * needed): the distinct (user, type) relation self-joins on
    * user_id — each user expands to at most |types|·(|types|−1)/2
    * pairs, so the join output is corpus-bounded with a bounded
    * constant, and the pair aggregate's result is |types|² rows.
    */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ut = Tables.load(spark, dir, "events")
      .select($"user_id", $"event_type").distinct()
    val sz = ut.groupBy($"event_type").agg(count(lit(1)).as("n"))
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(sz.select($"event_type".as("type_a"), $"n".as("n_a"))), Seq("type_a"))
      .join(broadcast(sz.select($"event_type".as("type_b"), $"n".as("n_b"))), Seq("type_b"))
      .withColumn("jaccard_ppm", expr("n_both * 1000000 div (n_a + n_b - n_both)"))
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_both", $"jaccard_ppm")
      .orderBy($"type_a", $"type_b")
  }

  /** Hourly DRIFT monitor — the batch backfill of the streaming drift
    * sink: per (hour window, event type), the total-variation distance
    * (integer ppm) between the hour's `floor(value)` bucket
    * distribution and the corpus-wide baseline distribution. The
    * rollup step is [[graft.streaming.EventStreams.tvAgainstBaseline]],
    * SHARED with the streaming `driftCells` sink's foreachBatch body —
    * live and backfill agree by construction (the trendingHourly
    * pattern); the corpus-scaled work is two keyed aggregates, the
    * baseline is broadcast.
    */
  def driftHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select($"event_type", window($"ts", "1 hour")("start").as("window_start"),
        expr("CAST(floor(value) AS BIGINT)").as("bucket"))
    val cells = ev.groupBy($"window_start", $"event_type", $"bucket")
      .agg(count(lit(1)).as("n"))
    val base0 = ev.groupBy($"event_type", $"bucket").agg(count(lit(1)).as("c"))
    val baseline = base0
      .join(broadcast(base0.groupBy($"event_type").agg(sum($"c").as("ct"))),
        Seq("event_type"))
      .select($"event_type", $"bucket", expr("(c * 1000000) div ct").as("base_ppm"))
    graft.streaming.EventStreams.tvAgainstBaseline(cells, baseline)
  }

  /** SESSION-SHAPE rollup — the engagement data-card row on top of
    * [[sessionize]]: sessions binned by ⌊log₂ n_events⌋ (the exact
    * powers-of-two device — no IEEE log), per bin the session count,
    * total events, and the longest session duration in exact
    * microseconds. Bin 0 is the one-event bounce population; the top
    * bins are the power users a per-user state store must size for.
    * One window pass (the sessionizer) + one bounded keyed aggregate.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pows = (1 to 62).map(i => 1L << i)
    sessionize(spark, dir)
      .withColumn("bin", size(filter(
        array(pows.map(lit(_)): _*), p => p <= $"n_events")).cast("long"))
      .withColumn("dur_us",
        expr("unix_micros(CAST(session_end AS TIMESTAMP))" +
          " - unix_micros(CAST(session_start AS TIMESTAMP))"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("total_events"),
        max($"dur_us").as("max_duration_us"))
      .orderBy($"bin")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_session_stats" -> sessionStats _,
    "s_drift_hourly" -> driftHourly _,
    "q_user_first_last" -> userFirstLast _,
    "q_retention" -> retentionCohorts _,
    "q_dau_wau" -> dauWau _,
    "q_event_paths" -> eventPaths _,
    "q_event_transitions" -> eventTransitions _,
    "q_audience_overlap" -> audienceOverlap _,
    "q_sessionize" -> sessionize _,
    "s_session_window" -> sessionWindow _,
    "q_funnel" -> funnel _,
    "s_tumbling_hourly" -> tumblingHourly _,
    "s_sliding_hourly" -> slidingHourly _,
    "s_turnout_by_nation" -> turnoutByNation _,
    "s_first_event_per_user" -> firstEventPerUser _,
    "s_trending_hourly" -> trendingHourly _,
  )

  private val sessionCte =
    """w AS (SELECT user_id, ts, event_id,
      |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |               OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                       + INTERVAL 30 MINUTE
      |             THEN 1 ELSE 0 END AS new_sess
      |      FROM events),
      |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |      FROM w)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_session_stats" -> {
      val powsList = (1 to 62).map(i => 1L << i).mkString("[", ", ", "]")
      s"""WITH $sessionCte,
        |sess AS (SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS n_events,
        |           epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |         FROM s GROUP BY 1, 2),
        |b AS (SELECT n_events, dur_us,
        |        CAST(len(list_filter($powsList, p -> p <= n_events)) AS BIGINT) AS bin
        |      FROM sess)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_sessions,
        |       CAST(sum(n_events) AS BIGINT) AS total_events,
        |       CAST(max(dur_us) AS BIGINT) AS max_duration_us
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin
    },
    "s_drift_hourly" ->
      """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS window_start,
        |             CAST(floor(value) AS BIGINT) AS bucket
        |           FROM events),
        |cells AS (SELECT window_start, event_type, bucket,
        |            CAST(count(*) AS BIGINT) AS n
        |          FROM e GROUP BY 1, 2, 3),
        |b0 AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS c
        |       FROM e GROUP BY 1, 2),
        |bt AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS ct FROM b0 GROUP BY 1),
        |base AS (SELECT b0.event_type, b0.bucket, (b0.c * 1000000) // bt.ct AS base_ppm
        |         FROM b0 JOIN bt USING (event_type)),
        |st AS (SELECT event_type, CAST(sum(base_ppm) AS BIGINT) AS base_total_ppm
        |       FROM base GROUP BY 1),
        |th AS (SELECT window_start, event_type, CAST(sum(n) AS BIGINT) AS t_h
        |       FROM cells GROUP BY 1, 2),
        |sc AS (SELECT c.window_start, c.event_type, c.n,
        |         (c.n * 1000000) // th.t_h AS p_h,
        |         coalesce(b.base_ppm, 0) AS base_ppm
        |       FROM cells c JOIN th USING (window_start, event_type)
        |       LEFT JOIN base b ON b.event_type = c.event_type AND b.bucket = c.bucket),
        |agg AS (SELECT window_start, event_type,
        |          CAST(sum(n) AS BIGINT) AS n_events,
        |          CAST(sum(abs(p_h - base_ppm)) AS BIGINT) AS sum_abs,
        |          CAST(sum(base_ppm) AS BIGINT) AS seen_base
        |        FROM sc GROUP BY 1, 2)
        |SELECT a.window_start, a.event_type, a.n_events,
        |       CAST((a.sum_abs + (s.base_total_ppm - a.seen_base)) // 2 AS BIGINT) AS tv_ppm
        |FROM agg a JOIN st s USING (event_type)
        |ORDER BY window_start, event_type""".stripMargin,
    "q_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |ex AS (SELECT user_id, day + o AS day FROM ud
        |       CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) t),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM ex
        |        WHERE day IN (SELECT day FROM dau) GROUP BY 1)
        |SELECT d.day, d.dau, w.wau,
        |       CAST((CAST(d.dau AS HUGEINT) * 1000000) // w.wau AS BIGINT) AS stickiness_ppm
        |FROM dau d JOIN wau w USING (day)
        |ORDER BY day""".stripMargin,
    "q_retention" ->
      """WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, week FROM w)
        |SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    "q_user_first_last" ->
      """SELECT user_id, count(*) AS n_events,
        |       arg_min(event_type, ts) AS first_type,
        |       arg_max(event_type, ts) AS last_type,
        |       epoch_us(max(ts)) - epoch_us(min(ts)) AS span_micros
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM events),
        |t AS (SELECT event_type AS src_type, dst AS dst_type, count(*) AS n_trans
        |      FROM s WHERE dst IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT src_type, CAST(sum(n_trans) AS BIGINT) AS tot FROM t GROUP BY 1)
        |SELECT t.src_type, t.dst_type, t.n_trans,
        |       CAST(t.n_trans * 1000000 // tot.tot AS BIGINT) AS share_ppm
        |FROM t JOIN tot USING (src_type)
        |ORDER BY src_type, dst_type""".stripMargin,
    "q_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sz AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
        |      FROM ut a JOIN ut b ON a.user_id = b.user_id
        |        AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
        |       CAST(n_both * 1000000 // (sa.n + sb.n - n_both) AS BIGINT) AS jaccard_ppm
        |FROM p JOIN sz sa ON sa.event_type = p.type_a
        |       JOIN sz sb ON sb.event_type = p.type_b
        |ORDER BY type_a, type_b""".stripMargin,
    "q_event_paths" ->
      s"""WITH r AS (SELECT user_id, event_type, ts, event_id,
        |             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |             count(*) OVER (PARTITION BY user_id) AS n_events
        |           FROM events)
        |SELECT user_id, n_events,
        |       string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |FROM r WHERE rn <= $MaxPathEvents
        |GROUP BY user_id, n_events ORDER BY user_id""".stripMargin,
    "q_sessionize" ->
      s"""WITH $sessionCte
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM s GROUP BY 1, 2 ORDER BY user_id, sess_id""".stripMargin,
    "s_session_window" ->
      s"""WITH $sessionCte
        |SELECT min(ts) AS window_start, max(ts) + INTERVAL 30 MINUTE AS window_end,
        |       user_id, count(*) AS n_events
        |FROM s GROUP BY user_id, sess_id ORDER BY user_id, window_start""".stripMargin,
    "q_funnel" ->
      """WITH su AS (SELECT user_id, min(ts) AS signup_ts FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |conv AS (SELECT DISTINCT su.user_id FROM su
        |         JOIN events e ON e.user_id = su.user_id
        |          AND e.event_type = 'purchase' AND e.ts >= su.signup_ts)
        |SELECT (SELECT count(*) FROM su) AS n_signup_users,
        |       (SELECT count(*) FROM conv) AS n_converted,
        |       (SELECT count(*) FROM conv) * 100.0 / (SELECT count(*) FROM su) AS conversion_pct""".stripMargin,
    "s_trending_hourly" ->
      s"""WITH c AS (SELECT date_trunc('hour', ts) AS window_start,
        |             date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |             event_type, count(*) AS cnt
        |           FROM events GROUP BY 1, 2, 3)
        |SELECT window_start, window_end, event_type, cnt, rnk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY window_start
        |       ORDER BY cnt DESC, event_type) AS BIGINT) AS rnk
        |  FROM c) WHERE rnk <= $TrendingK
        |ORDER BY window_start, rnk""".stripMargin,
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
