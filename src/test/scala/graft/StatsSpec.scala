package graft

import org.apache.spark.sql.functions._

import graft.operators.{Redaction, Stats, TextAnalysis}
import graft.plans.ZOrder

/** Driver-side recomputation checks for the Stats / Redaction / tfidf
  * surface (the oracle is the main gate; these pin the semantics
  * against an independent in-process reference and the edge cases the
  * oracle data never hits).
  */
class StatsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("ZOrder.morton matches a bit-by-bit Scala interleave on a grid") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = grid.toDF("x", "y")
      .withColumn("z", ZOrder.morton("x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"morton($x, $y)")
    }
    // and the high end of the 16-bit domain
    val hi = Seq((65535L, 0L), (0L, 65535L), (65535L, 65535L), (40000L, 123L))
    val gotHi = hi.toDF("x", "y").withColumn("z", ZOrder.morton("x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    hi.foreach { case (x, y) => assert(gotHi((x, y)) == ref(x, y)) }
  }

  test("spikeMinutes equals a BigInt recompute of the squared 3-sigma rule") {
    import spark.implicits._
    val per = graft.engine.Tables.load(spark, dir, "events")
      .select($"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 60000000").as("minute"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("y"))
      .groupBy($"event_type", $"minute")
      .agg(sum($"y").as("total")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = per.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      val n = BigInt(rs.length)
      val s1 = rs.map(r => BigInt(r._3)).sum
      val s2 = rs.map(r => BigInt(r._3) * r._3).sum
      rs.filter { r =>
        val dev = n * r._3 - s1
        dev * dev > 9 * (n * s2 - s1 * s1)
      }.map(r => (t, r._2, r._3)).toSeq
    }.toSet
    assert(expect.nonEmpty, "fixture has no spike minutes — test is vacuous")
    val got = Stats.spikeMinutes(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
  }

  test("trendSlope matches an exact BigInt recompute of the closed form") {
    import spark.implicits._
    val rows = graft.engine.Tables.load(spark, dir, "events")
      .select($"event_type", $"ts", $"value").collect()
    val byType = rows.groupBy(_.getString(0)).map { case (t, rs) =>
      val xy = rs.map { r =>
        val micros = r.getAs[java.time.LocalDateTime](1)
          .toInstant(java.time.ZoneOffset.UTC)
        val x = BigInt(micros.getEpochSecond * 1000000L + micros.getNano / 1000L) /
          60000000L - Stats.TrendEpochMinutes
        val y = BigInt(java.math.BigDecimal.valueOf(r.getDouble(2))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact())
        (x, y)
      }
      val n = BigInt(xy.length)
      val sx = xy.map(_._1).sum
      val sy = xy.map(_._2).sum
      val sxy = xy.map { case (x, y) => x * y }.sum
      val sxx = xy.map { case (x, _) => x * x }.sum
      t -> ((n, n * sxy - sx * sy, n * sxx - sx * sx))
    }
    val got = Stats.trendSlope(spark, dir).collect()
    assert(got.length == byType.size)
    got.foreach { r =>
      val (n, num, den) = byType(r.getString(0))
      assert(BigInt(r.getLong(1)) == n)
      assert(den > 0, "time spread means a positive denominator")
      // exact pinned-scale slope: trunc(num * 1e12 / den), sign-decomposed;
      // num/den stay internal — only the BIGINT slope crosses the contract
      val e12 = (num.abs * BigInt("1000000000000")) / den
      val expect = if (num < 0) -e12 else e12
      assert(BigInt(r.getLong(2)) == expect, s"${r.getString(0)} slope_e12")
    }
  }

  test("madOutliers matches a driver-side median/MAD recompute") {
    import spark.implicits._
    // same interpolation formula as Spark's percentile: lo + (hi-lo)*0.5
    def p50(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else {
        val lo = s(s.length / 2 - 1); val hi = s(s.length / 2)
        lo + (hi - lo) * 0.5
      }
    }
    val rows = graft.engine.Tables.load(spark, dir, "events")
      .select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSeq).toMap
    val got = Stats.madOutliers(spark, dir).collect()
    got.foreach { r =>
      val vs = rows(r.getString(0))
      val med = p50(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = p50(devs)
      assert(r.getDouble(1) == med, s"${r.getString(0)} median")
      assert(r.getDouble(2) == mad, s"${r.getString(0)} mad")
      assert(r.getLong(3) == vs.length.toLong)
      assert(r.getLong(4) == devs.count(_ > mad * 3.0).toLong)
    }
  }

  test("winsorized totals match a driver recompute and clamp only the tails") {
    import spark.implicits._
    // Spark percentile / DuckDB quantile_cont linear interpolation:
    // index q·(n−1), value v[i] + frac·(v[i+1]−v[i])
    def q(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted
      val idx = p * (s.length - 1)
      val i = idx.toInt
      if (i + 1 >= s.length) s.last.toDouble
      else s(i) + (idx - i) * (s(i + 1) - s(i)).toDouble
    }
    val rows = graft.engine.Tables.load(spark, dir, "orders")
      .selectExpr("o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val got = Stats.winsorized(spark, dir).collect()
    assert(got.length === rows.size)
    got.foreach { r =>
      val vs = rows(r.getString(0))
      val lo = math.floor(q(vs, Stats.WinsorLo)).toLong
      val hi = math.floor(q(vs, Stats.WinsorHi)).toLong
      val w = vs.map(v => math.max(lo, math.min(hi, v)))
      assert(r.getLong(1) === vs.length.toLong, s"${r.getString(0)} n")
      assert(r.getLong(2) === vs.count(_ < lo).toLong, s"${r.getString(0)} n_low")
      assert(r.getLong(3) === vs.count(_ > hi).toLong, s"${r.getString(0)} n_high")
      assert(r.getLong(4) === vs.sum, s"${r.getString(0)} sum")
      assert(r.getLong(5) === w.sum, s"${r.getString(0)} winsorized")
      // clamping can only shrink spread, never increase the total by
      // more than the clamped tail mass; roughly 10% of rows clamp
      assert(r.getLong(2) + r.getLong(3) <= (vs.length * 2) / 10 + 2)
    }
  }

  test("histoMedian matches a driver recompute and plans bounded state") {
    import spark.implicits._
    val binW = graft.operators.Stats.HistoBinCents
    val rows = graft.engine.Tables.load(spark, dir, "events")
      .select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map { r =>
        java.math.BigDecimal.valueOf(r.getDouble(1))
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact() / binW
      }.toSeq).toMap
    val got = Stats.histoMedian(spark, dir).collect()
    assert(got.length == rows.size)
    got.foreach { r =>
      val bins = rows(r.getString(0)).sorted
      val n = bins.length
      // first bin whose cumulative count reaches ceil(n/2) = the
      // bin holding the (n+1) div 2 -th smallest value
      val medianBin = bins((n + 1) / 2 - 1)
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(2) == medianBin, s"${r.getString(0)} median bin")
      assert(r.getLong(3) == medianBin * binW)
    }
    // the at-scale contract: no exact-percentile buffer anywhere, and
    // the cumulative window consumes the (type, bin) AGGREGATE — its
    // input is bin-count-bounded metadata, not corpus rows
    val plan = Stats.histoMedian(spark, dir).queryExecution.optimizedPlan
    assert(!plan.toString.toLowerCase.contains("percentile"))
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val aggBelow = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggBelow.nonEmpty, "cumulative window must sit above the bin aggregate")
    }
  }

  test("modeValue picks the max-count value with min-value tiebreak") {
    import spark.implicits._
    val rows = graft.engine.Tables.load(spark, dir, "events")
      .select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSeq).toMap
    val got = Stats.modeValue(spark, dir).collect()
    got.foreach { r =>
      val counts = rows(r.getString(0)).groupBy(identity).view.mapValues(_.size).toMap
      val mx = counts.values.max
      val expectVal = counts.filter(_._2 == mx).keys.min
      assert(r.getDouble(1) == expectVal, s"${r.getString(0)} mode value")
      assert(r.getLong(2) == mx.toLong, s"${r.getString(0)} mode count")
    }
  }

  test("tvDrift equals an exact driver recompute of half-split TV distance") {
    import spark.implicits._
    val raw = graft.engine.Tables.load(spark, dir, "events")
      .select($"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
        expr("CAST(floor(value) AS BIGINT)").as("bucket"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lo = raw.map(_._2).min
    val hi = raw.map(_._2).max
    val expected = raw.groupBy(_._1).map { case (tpe, rows) =>
      val (h1, h2) = rows.partition(r => r._2 * 2 <= lo + hi)
      val c1 = h1.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val c2 = h2.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val (t1, t2) = (h1.length.toLong, h2.length.toLong)
      val tv = (c1.keySet ++ c2.keySet).toSeq.map { b =>
        val p1 = c1.getOrElse(b, 0L) * 1000000L / t1
        val p2 = if (t2 == 0) 0L else c2.getOrElse(b, 0L) * 1000000L / t2
        math.abs(p1 - p2)
      }.sum / 2
      tpe -> ((c1.keySet ++ c2.keySet).size.toLong, t1, t2, tv)
    }
    val got = Stats.tvDrift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === expected)
    // the split accounts every event and drift stays in [0, 1e6]
    assert(got.values.map(v => v._2 + v._3).sum === raw.length.toLong)
    got.values.foreach(v => assert(v._4 >= 0L && v._4 <= 1000000L))
  }

  test("sketch rollup: union of daily partials equals the one-shot sketch, within HLL error") {
    import spark.implicits._
    // surfaced rows: (day, exact_users, est_in_bound) — every bound
    // flag must hold (the same invariant the DuckDB oracle hash-pins)
    val rows = Stats.sketchRollup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val (totals, days) = rows.partition(_._1 == "TOTAL")
    assert(totals.length === 1 && days.nonEmpty)
    rows.foreach { case (day, exact, inBound) =>
      assert(inBound, s"row $day: estimate outside 5% of exact $exact")
    }
    // TOTAL's exact column is the global distinct
    val exactTotal = graft.engine.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(totals.head._2 === exactTotal)
    // mergeability on the raw sketches: the unioned-partials estimate
    // must equal a direct one-shot sketch (same lgK, deterministic)
    val e = graft.engine.Tables.load(spark, dir, "events")
    val unioned = e.select(to_date($"ts").as("day"), $"user_id")
      .groupBy($"day").agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head.getLong(0)
    val direct = e
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")).head.getLong(0)
    assert(unioned === direct, "union of partials != one-shot sketch")
  }

  test("piiScan finds exactly the planted PII and redacts to the Java-regex reference") {
    import spark.implicits._
    val lines = Redaction.logLines(spark, dir).orderBy($"event_id").limit(50).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val scan = Redaction.piiEvents(spark, dir).limit(50).collect()
    assert(scan.length == 50)
    scan.foreach { r =>
      assert(r.getLong(1) == 1L, "one email per line")
      assert(r.getLong(2) == 1L, "one IPv4 per line")
      assert(r.getLong(3) == 1L, "one phone per line")
      val msg = lines(r.getLong(0))
      val redacted = msg
        .replaceAll(Redaction.EmailRe, "[EMAIL]")
        .replaceAll(Redaction.Ipv4Re, "[IP]")
        .replaceAll(Redaction.PhoneRe, "[PHONE]")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(redacted.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(4) == md, s"redaction fingerprint for event ${r.getLong(0)}")
      assert(!redacted.contains("@example.com") && !redacted.contains("ip=10."),
        "no PII survives redaction")
    }
  }

  test("domainStats rolls up to the ten synthesized domains with the blocklist flagged") {
    import spark.implicits._
    val got = Redaction.domainEvents(spark, dir).collect()
    val expectDomains = graft.engine.Tables.load(spark, dir, "events")
      .select(($"user_id" % 10).as("d")).distinct().collect()
      .map(r => s"cdn${r.getLong(0)}.example.org").sorted.toSeq
    assert(got.map(_.getString(0)).toSeq == expectDomains)
    val blocked = got.filter(_.getBoolean(3)).map(_.getString(0)).toSet
    assert(blocked == Redaction.Blocklist.toSet.intersect(expectDomains.toSet))
    val total = got.map(_.getLong(1)).sum
    assert(total == graft.engine.Tables.load(spark, dir, "events").count())
  }

  test("domainStatsAgainst (blocklist table) agrees with the literal twin") {
    import spark.implicits._
    val lines = Redaction.logLines(spark, dir)
    val literal = Redaction.domainStats(lines, "user_id", "msg").collect()
    // the governance frame carries extra unknown domains — they must
    // not invent rows, only mark membership of observed ones
    val bl = (Redaction.Blocklist :+ "never-seen.example.net").toDF("domain")
    val tabled = Redaction.domainStatsAgainst(lines, "user_id", "msg", bl).collect()
    assert(tabled.map(_.toSeq.toList).toList == literal.map(_.toSeq.toList).toList)
    // and an empty blocklist flags nothing
    val none = Redaction.domainStatsAgainst(
      lines, "user_id", "msg", Seq.empty[String].toDF("domain")).collect()
    assert(none.forall(!_.getBoolean(3)))
    assert(none.map(_.getString(0)).toSeq == literal.map(_.getString(0)).toSeq)
  }

  test("tfidf scores follow the integer-idf formula and rank at most 5 per doc") {
    import spark.implicits._
    val out = TextAnalysis.tfidf(spark, dir)
    val nDocs = graft.engine.Tables.load(spark, dir, "documents").count()
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tf, df, score, rn) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(rn >= 1 && rn <= 5)
      assert(score == tf * ((TextAnalysis.IdfScale * nDocs) / df), "integer idf formula")
    }
    val perDoc = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perDoc.values.forall(_ <= 5))
    // ranks are dense from 1 within each doc
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(5)).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("histoQuantiles: p50 equals histoMedian, vector is monotone, bins are exact") {
    val med = Stats.histoMedian(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val rows = Stats.histoQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, p25, p50, p75, p95) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p50 == med(t), s"p50 bin for $t must equal histoMedian's")
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95, s"quantile vector monotone for $t")
    }
    // each reported bin is the FIRST whose cumulative count reaches
    // ceil(p*n/100) — recomputed from the raw values on the driver
    val cents = graft.engine.Tables.load(spark, dir, "events")
      .selectExpr("event_type",
        s"CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div ${Stats.HistoBinCents} AS bin")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val bins = cents.filter(_._1 == r.getString(0)).map(_._2).sorted
      val n = bins.length
      Stats.HistoQuantilePcts.zipWithIndex.foreach { case (p, i) =>
        val need = (p * n + 99) / 100
        assert(r.getLong(2 + i) == bins(need.toInt - 1),
          s"p$p bin for ${r.getString(0)}")
      }
    }
  }

  test("luhnScan validates against a reference Scala Luhn; synthesis flips every third event") {
    import spark.implicits._
    def refLuhn(cc: String): Boolean = {
      val s = cc.zipWithIndex.map { case (ch, idx) =>
        val d = ch - '0'
        if ((idx + 1) % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      s % 10 == 0
    }
    // hand-built candidates: a crafted valid number and its corruptions
    val base = "453957876362148"
    val check = (10 - base.zipWithIndex.map { case (ch, idx) =>
      val d = ch - '0'
      if ((idx + 1) % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum % 10) % 10
    val cards = (0 to 9).map(d => base + d.toString)
    val df = cards.zipWithIndex
      .map { case (cc, i) => (i.toLong, s"x card $cc y") }
      .toDF("event_id", "msg")
    val got = Redaction.luhnScan(df, Seq("event_id"), "msg").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    cards.zipWithIndex.foreach { case (cc, i) =>
      assert(got(i.toLong) == refLuhn(cc), s"card $cc")
      assert(got(i.toLong) == (cc.last - '0' == check), "exactly the computed check digit validates")
    }
    // the surfaced synthesis: corrupted check digit ⇔ event_id % 3 = 0
    val ev = Redaction.ccEvents(spark, dir).collect()
    assert(ev.nonEmpty)
    ev.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) % 3 != 0),
        s"event ${r.getLong(0)} validity")
      assert(r.getString(1).matches("XXXX-XXXX-XXXX-\\d{4}"))
    }
  }

  test("zorderParts key order groups both dimensions (locality smoke)") {
    import spark.implicits._
    val out = Stats.zorderParts(spark, dir).collect()
    assert(out.nonEmpty)
    // z recomputes from the dims by the reference interleave
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    out.foreach { r =>
      assert(r.getLong(3) == ref(r.getLong(1), r.getLong(2)))
    }
    // and the output really is sorted by (z, key)
    val zs = out.map(r => (r.getLong(3), r.getLong(0))).toSeq
    assert(zs == zs.sorted)
  }

  test("zone map partitions the table and its skip flag matches the ranges") {
    val parts = graft.engine.Tables.load(spark, dir, "part")
    val zones = Stats.zoneMap(spark, dir).collect()
    assert(zones.nonEmpty)
    // zones partition the table
    assert(zones.map(_.getLong(1)).sum === parts.count())
    zones.foreach { r =>
      val (zone, zMin, zMax) = (r.getLong(0), r.getLong(2), r.getLong(3))
      // every z in the zone falls in [zone·W, (zone+1)·W)
      assert(zMin / Stats.ZoneWidth === zone)
      assert(zMax / Stats.ZoneWidth === zone)
      assert(r.getLong(4) <= r.getLong(5)) // size range ordered
      // skip flag is exactly the range predicate
      assert(r.getBoolean(10) ===
        (r.getLong(4) <= Stats.ZoneProbeSize && r.getLong(5) >= Stats.ZoneProbeSize))
    }
    // pruning must actually bite: some zone is skippable for size=7
    assert(zones.exists(r => !r.getBoolean(10)))
  }

  test("table stats agree with directly-computed per-column profiles") {
    import spark.implicits._
    val li = graft.engine.Tables.load(spark, dir, "lineitem")
    val got = Stats.tableStats(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toMap
    assert(got.keySet === Stats.StatsColumns.toSet)
    val (ndvRf, minRf, maxRf) = (
      li.select($"l_returnflag").distinct().count(),
      li.agg(org.apache.spark.sql.functions.min($"l_returnflag")).head.getString(0),
      li.agg(org.apache.spark.sql.functions.max($"l_returnflag")).head.getString(0))
    assert(got("l_returnflag") === ((ndvRf, 0L, minRf, maxRf)))
    // orderkey min/max come back as the NUMERIC extrema rendered as
    // strings (not lexicographic string extrema)
    val (loOk, hiOk) = (
      li.agg(org.apache.spark.sql.functions.min($"l_orderkey")).head.getLong(0),
      li.agg(org.apache.spark.sql.functions.max($"l_orderkey")).head.getLong(0))
    assert(got("l_orderkey")._3 === loOk.toString)
    assert(got("l_orderkey")._4 === hiOk.toString)
  }
}
