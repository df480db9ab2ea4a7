package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, TextAnalysis, TimeSeries}

/** Semantics of the time-series operators on synthetic frames (edges
  * the testdata never hits) plus shape checks on the real tables.
  */
class TimeSeriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: inclusive match, carry-forward, and no-prior nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")), // before any right row
      (1L, 11L, ts("2024-01-01 00:00:10")), // exactly at a right ts -> inclusive
      (1L, 12L, ts("2024-01-01 00:00:30")), // carries the 00:10 row forward
      (2L, 20L, ts("2024-01-01 00:00:30"))  // key with no right rows at all
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 100L, ts("2024-01-01 00:00:10")),
      (1L, 101L, ts("2024-01-01 00:00:40"))  // after every probe
    ).toDF("user_id", "last_click_id", "last_click_ts")
    val out = TimeSeries.asofJoin(left, right, "user_id", "ts", "last_click_ts", "last_click_id")
      .orderBy($"event_id")
      .select($"event_id", $"last_click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(out.toSeq == Seq(10L -> None, 11L -> Some(100L), 12L -> Some(100L), 20L -> None))
  }

  test("asofJoin: greatest tiebreak wins among right rows sharing (key, ts)") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 00:01:00"))).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, 7L, ts("2024-01-01 00:00:30")),
      (1L, 9L, ts("2024-01-01 00:00:30"))
    ).toDF("user_id", "last_click_id", "last_click_ts")
    val got = TimeSeries.asofJoin(left, right, "user_id", "ts", "last_click_ts", "last_click_id")
      .select($"last_click_id").collect().head.getLong(0)
    assert(got == 9L)
  }

  test("intervalJoin: bucketed equi-join equals the naive range join, boundaries inclusive") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 01:00:00")),
      (1L, 11L, ts("2024-01-01 02:00:00")),
      (2L, 20L, ts("2024-01-01 01:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 00:50:00")),  // 10 min before 01:00 -> inclusive edge
      (1L, ts("2024-01-01 01:00:00")),  // exact -> inclusive
      (1L, ts("2024-01-01 01:00:01")),  // 1s after -> out for 01:00
      (2L, ts("2024-01-01 00:49:59"))   // just outside the window
    ).toDF("user_id", "cts")
    val out = TimeSeries.intervalJoin(left, right, "user_id", "ts", "cts",
        TimeSeries.RollingWindowMicros)
      .groupBy($"event_id").agg(count($"cts").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 2L, 11L -> 0L, 20L -> 0L))
  }

  test("stream-stream interval join: in-window match plus watermark-released outer row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val errs = MemoryStream[(Long, Timestamp, Long)]
    val clks = MemoryStream[(Long, Timestamp, Long)]
    val e = errs.toDF().toDF("user_id", "ts", "event_id")
    val c = clks.toDF().toDF("user_id", "cts", "click_id")
    val joined = graft.streaming.EventStreams
      .streamIntervalJoin(e, c, "user_id", "ts", "cts", 10)
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ssij").toString
    errs.addData((1L, ts("2024-01-01 10:00:00"), 100L),
      (2L, ts("2024-01-01 10:00:00"), 200L))
    clks.addData((1L, ts("2024-01-01 09:55:00"), 900L))
    val q = graft.streaming.EventStreams
      .runToMemory(joined, "ssij", ckptDir, OutputMode.Append())
    // push both watermarks far past 10:00 so the unmatched left row is
    // provably final and the outer null emits
    errs.addData((9L, ts("2024-01-01 12:00:00"), 999L))
    clks.addData((9L, ts("2024-01-01 12:00:00"), 998L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssij")
      .filter($"event_id".isin(100L, 200L))
      .select($"event_id", $"click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows == Map(100L -> Some(900L), 200L -> None))
  }

  test("gapFillMinutes: dense spine, zeros on gaps, endpoints preserved") {
    import spark.implicits._
    val out = TimeSeries.gapFillMinutes(spark, dir)
    val perType = out.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        min($"minute").as("mn"), max($"minute").as("mx"),
        sum(when($"cnt" === 0, 1).otherwise(0)).as("zeros"))
      .collect()
    perType.foreach { r =>
      val expected = (r.getTimestamp(3).getTime - r.getTimestamp(2).getTime) / 60000 + 1
      assert(r.getLong(1) == expected, s"spine must be dense for ${r.getString(0)}")
      assert(r.getLong(4) > 0, "sf0.001 events are sparse enough to have gap minutes")
    }
    // endpoints carry real counts by construction (min/max came from data)
    val ends = out.groupBy($"event_type").agg(min($"minute").as("m")).join(out, Seq("event_type"))
      .filter($"minute" === $"m").select($"cnt").collect()
    assert(ends.forall(_.getLong(0) > 0))
  }

  test("rollingSum: the range frame is event-time, inclusive at the 10-minute edge") {
    import spark.implicits._
    // cross-check one user against a driver-side recompute
    val rows = TimeSeries.rollingSum(spark, dir)
      .filter($"user_id" === 8).orderBy($"ts").collect()
    assert(rows.nonEmpty)
    def millis(r: org.apache.spark.sql.Row): Long =
      r.getAs[java.time.LocalDateTime](2).toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val evs = rows.map(r => (millis(r), BigDecimal(r.getDouble(3))))
    rows.zipWithIndex.foreach { case (r, i) =>
      val t = millis(r)
      val expect = evs.filter { case (et, _) => et >= t - 600000L && et <= t }.map(_._2).sum
      assert(math.abs(expect.toDouble - r.getDouble(4)) < 1e-9,
        s"row $i rolling sum mismatch")
    }
  }

  test("text_repetition: ratios bounded and exact on a hand-checked doc") {
    import spark.implicits._
    val out = TextAnalysis.repetition(spark, dir).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val dup = r.getDouble(2)
      assert(dup >= 0.0 && dup < 1.0)
      val top = r.getDouble(3)
      assert(top > 0.0 && top <= 1.0)
    }
  }

  test("corpus_stratified: every language thinned to about the smallest") {
    import spark.implicits._
    val kept = Corpus.stratified(spark, dir).groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = graft.engine.Tables.load(spark, dir, "documents")
      .groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mn = full.values.min
    kept.foreach { case (lang, n) =>
      assert(n <= full(lang))
      // hash-uniform thinning: expect within ~35% of the min count
      assert(math.abs(n.toDouble - mn) / mn < 0.35, s"$lang kept $n vs target $mn")
    }
    assert(full.keySet == kept.keySet, "no language may vanish")
  }

  // ---- differential tests: operator vs naive reference on random frames ----

  private def randomEvents(n: Int, seed: Long, users: Int): Seq[(Long, Long, Timestamp)] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      (rng.nextInt(users).toLong, i.toLong,
        new Timestamp(1704067200000L + rng.nextInt(3600 * 1000).toLong))
    }
  }

  test("asofJoin equals the naive max-prior-right join on random frames") {
    import spark.implicits._
    for (seed <- Seq(1L, 7L, 99L)) {
      val probes = randomEvents(80, seed, users = 5).toDF("user_id", "event_id", "ts")
      val rights = randomEvents(60, seed + 1000, users = 5)
        .toDF("user_id", "last_click_id", "last_click_ts")
      val got = TimeSeries
        .asofJoin(probes, rights, "user_id", "ts", "last_click_ts", "last_click_id")
        .collect()
        .map(r => r.getLong(1) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      // naive: per probe, scan all rights of the key, keep the latest <= ts
      // (ties on ts -> greatest id), computed driver-side
      val rs = rights.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      val expect = probes.collect().map { p =>
        val (u, id, t) = (p.getLong(0), p.getLong(1), p.getTimestamp(2))
        val cand = rs.filter(x => x._1 == u && !x._3.after(t))
        val best = if (cand.isEmpty) -1L
          else cand.maxBy(x => (x._3.getTime, x._2))._2
        id -> best
      }.toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("asofJoinForward equals the naive min-following-right join on random frames") {
    import spark.implicits._
    for (seed <- Seq(2L, 13L, 77L)) {
      val probes = randomEvents(80, seed, users = 5).toDF("user_id", "event_id", "ts")
      val rights = randomEvents(60, seed + 2000, users = 5)
        .toDF("user_id", "next_click_id", "next_click_ts")
      val got = TimeSeries
        .asofJoinForward(probes, rights, "user_id", "ts", "next_click_ts", "next_click_id")
        .collect()
        .map(r => r.getLong(1) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      // naive: per probe, scan all rights of the key, keep the earliest
      // >= ts (ties on ts -> smallest id), computed driver-side
      val rs = rights.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      val expect = probes.collect().map { p =>
        val (u, id, t) = (p.getLong(0), p.getLong(1), p.getTimestamp(2))
        val cand = rs.filter(x => x._1 == u && !x._3.before(t))
        val best = if (cand.isEmpty) -1L
          else cand.minBy(x => (x._3.getTime, x._2))._2
        id -> best
      }.toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("intervalJoin equals the naive theta-join on random frames") {
    import spark.implicits._
    val W = 5L * 60L * 1000000L // 5 minutes in micros
    for (seed <- Seq(3L, 42L)) {
      val probes = randomEvents(60, seed, users = 4).toDF("user_id", "event_id", "ts")
      val rights = randomEvents(80, seed + 500, users = 4)
        .toDF("user_id", "cts", "ignore").select($"user_id", $"cts".cast("long").as("rid"),
          $"ignore".as("cts")).select($"user_id", $"rid", $"cts")
      val got = TimeSeries.intervalJoin(probes, rights, "user_id", "ts", "cts", W)
        .groupBy($"event_id").agg(count($"rid").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rs = rights.collect().map(r => (r.getLong(0), r.getTimestamp(2).getTime))
      val expect = probes.collect().map { p =>
        val (u, id, t) = (p.getLong(0), p.getLong(1), p.getTimestamp(2).getTime)
        id -> rs.count(x => x._1 == u && x._2 >= t - W / 1000L && x._2 <= t).toLong
      }.toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("intervalJoinCapped equals intervalJoin when the cap exceeds every cell") {
    import spark.implicits._
    val W = 5L * 60L * 1000000L
    val probes = randomEvents(60, 21L, users = 4).toDF("user_id", "event_id", "ts")
    val rights = randomEvents(80, 22L, users = 4).toDF("user_id", "rid", "cts")
    val uncapped = TimeSeries.intervalJoin(probes, rights, "user_id", "ts", "cts", W)
      .groupBy($"event_id").agg(count($"rid").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val capped = TimeSeries.intervalJoinCapped(probes, rights, "user_id", "ts", "cts",
        "rid", W, cap = 1000000)
      .groupBy($"event_id").agg(count($"rid").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == uncapped)
  }

  test("intervalJoinCapped with a binding cap matches the per-cell latest-N reference") {
    import spark.implicits._
    val W = 5L * 60L * 1000000L
    for (seed <- Seq(31L, 57L)) {
      // few users + short horizon -> cells hold well over `cap` rows
      val probes = randomEvents(40, seed, users = 2).toDF("user_id", "event_id", "ts")
      val rights = randomEvents(120, seed + 9000, users = 2).toDF("user_id", "rid", "cts")
      val cap = 3
      val got = TimeSeries.intervalJoinCapped(probes, rights, "user_id", "ts", "cts",
          "rid", W, cap)
        .groupBy($"event_id").agg(count($"rid").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: replicate each right row into its two window-width
      // cells, keep the latest `cap` per (key, cell) by (cts, rid)
      // descending, then count survivors inside each probe's window
      val rs = rights.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
      val surviving = rs.flatMap { case (u, rid, t) =>
        val b = (t * 1000L) / W
        Seq(((u, b), (rid, t)), ((u, b + 1), (rid, t)))
      }.groupBy(_._1).toSeq.flatMap { case ((u, cell), rows) =>
        rows.map(_._2).sortBy { case (rid, t) => (-t, -rid) }.take(cap)
          .map { case (rid, t) => (u, cell, rid, t) }.toSeq
      }
      val expect = probes.collect().map { p =>
        val (u, id, t) = (p.getLong(0), p.getLong(1), p.getTimestamp(2).getTime)
        val lb = (t * 1000L) / W
        id -> surviving.count { case (ru, cell, _, rt) =>
          ru == u && cell == lb && rt * 1000L >= t * 1000L - W && rt <= t
        }.toLong
      }.toMap
      assert(got == expect, s"seed $seed")
      // the cap must actually bind somewhere or this test is vacuous
      val uncapped = TimeSeries.intervalJoin(probes, rights, "user_id", "ts", "cts", W)
        .groupBy($"event_id").agg(count($"rid").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.exists { case (k, v) => uncapped(k) > v }, s"seed $seed: cap never bound")
      assert(got.forall { case (k, v) => v <= uncapped(k) }, "capped may only under-count")
    }
  }

  test("event transitions conserve mass: shares sum to ~1e6 and counts to n - users-with-1") {
    import spark.implicits._
    val rows = graft.operators.WindowedEvents.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // per source, shares are a floor-division partition of 1e6
    rows.groupBy(_._1).values.foreach { g =>
      val s = g.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - g.length,
        s"share mass $s out of bounds for ${g.head._1}")
    }
    // every adjacent pair is counted once: Σ n_trans = Σ_users (n_u − 1)
    val ev = graft.engine.Tables.load(spark, dir, "events")
    val expected = ev.groupBy($"user_id").count()
      .agg(sum(col("count") - 1)).collect()(0).getLong(0)
    assert(rows.map(_._3).sum === expected)
  }

  test("audience overlap bounds: n_both <= min side, jaccard within [0, 1e6]") {
    val rows = graft.operators.WindowedEvents.audienceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nA, nB, both, j) =>
      assert(both <= math.min(nA, nB), s"($a,$b) overlap exceeds a side")
      assert(j >= 0L && j <= 1000000L, s"($a,$b) jaccard $j")
      assert(j === both * 1000000L / (nA + nB - both), s"($a,$b) jaccard formula")
    }
  }

  test("globalRowNumber equals a single-window row_number on random frames") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(5L, 11L)) {
      val rng = new scala.util.Random(seed)
      // heavy ties on purpose: values from a small domain
      val df = (0 until 500).map(i => (i.toLong, rng.nextInt(20) * 1.0))
        .toDF("id", "v")
      val got = graft.operators.Ranking
        .globalRowNumber(df, "rank", buckets = 7, bucketCol = "v", ascending = true,
          $"v", $"id")
        .select($"id", $"rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = df.withColumn("rank",
          row_number().over(Window.orderBy($"v", $"id")).cast("long"))
        .select($"id", $"rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("scd2Enrich picks the version valid at event time for every event") {
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val dayUs = 86400000000L
    val got = TimeSeries.scd2Enrich(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val events = graft.engine.Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id",
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === events.length, "LEFT semantics: every event survives")
    val byId = got.map(t => t._1 -> t).toMap
    events.foreach { case (id, user, tsMs) =>
      val spacing = (user % 30 + 10) * dayUs
      val elapsed = tsMs - base
      val version = math.min(2L, math.max(0L, elapsed / spacing))
      if (elapsed >= 0) {
        assert(byId(id)._4 === version, s"event $id version")
        assert(byId(id)._3 === s"seg${(user + version) % 5}", s"event $id segment")
      }
    }
  }

  test("ohlcHourly equals a driver recompute with deterministic open/close election") {
    import spark.implicits._
    val ev = graft.engine.Tables.load(spark, dir, "events")
      .select($"event_type", $"event_id",
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCell = ev.groupBy(t => (t._1, Math.floorDiv(t._3, 3600000000L)))
    val got = TimeSeries.ohlcHourly(spark, dir).collect()
    assert(got.length === byCell.size)
    got.foreach { r =>
      val cell = byCell((r.getString(0), r.getLong(1)))
      val ordered = cell.sortBy(t => (t._3, t._2)) // (micros, event_id) total order
      assert(r.getLong(2) === ordered.head._4, "open")
      assert(r.getLong(3) === cell.map(_._4).max, "high")
      assert(r.getLong(4) === cell.map(_._4).min, "low")
      assert(r.getLong(5) === ordered.last._4, "close")
      assert(r.getLong(6) === cell.length.toLong, "volume")
      assert(r.getLong(7) === cell.map(_._4).sum, "total")
    }
  }
}
