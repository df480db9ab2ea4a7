package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.plans.ZOrder

/** Distribution analytics over `events` the reference's dashboard
  * family implies but never names: per-group trend detection, robust
  * outlier flagging, deterministic mode — plus the Z-order layout key
  * surfaced as a query so the oracle pins the interleave formula.
  *
  * Everything here is engine-exact by construction: trend runs the OLS
  * closed form over INTEGER sums (minutes × cents) so no per-engine
  * float summation order exists; MAD reuses the proven
  * percentile == quantile_cont parity; mode breaks ties by minimum
  * value. Each is one or two keyed hash aggregates on a data-scaled
  * key — the 100 TB shape is partial aggregation, no windows.
  */
object Stats {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  /** Minutes from epoch to 2024-01-01T00:00Z — recenters x so the
    * closed-form products stay far inside DECIMAL(38) / HUGEINT range
    * at any realistic corpus span.
    */
  val TrendEpochMinutes = 28401120L

  /** Per-type linear trend (OLS slope) of `value` over event time.
    * x = whole minutes since 2024-01-01, y = value in cents — both
    * exact integers, so every aggregate below is order-independent
    * and the closed form
    *   slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx)
    * is evaluated in exact DECIMAL(38,0) arithmetic internally and
    * emitted ONLY as `slope_e12`, the slope at a pinned 10¹² integer
    * scale: trunc(num·10¹² / den), a BIGINT. The exact num/den never
    * cross the hashed contract: DECIMAL(38,0) output columns shipped
    * red in r5/r6 because a 38-digit value cannot round-trip an
    * int64-coercing reader (and a raw double slope shipped red in r5
    * purely on cross-engine double formatting). The division is
    * sign-decomposed (den ≥ 0 always, by Cauchy–Schwarz) so the
    * truncation direction cannot differ between Spark's `div` and
    * DuckDB's `//` on a negative numerator. Per-row products are cast
    * to DECIMAL *before* multiplying — BIGINT·BIGINT would wrap
    * silently past 2⁶³ for extreme value×timespan inputs. One shuffle
    * (the groupBy) with map-side partials; the driver never sees a row.
    */
  def trendSlope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .select($"event_type",
        expr(s"unix_micros(CAST(ts AS TIMESTAMP)) div 60000000 - $TrendEpochMinutes").as("x"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("y"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"),
        sum($"y").as("sy"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * x")).as("sxx"))
      .select($"event_type", $"n",
        expr("CAST(CAST(n AS DECIMAL(20,0)) * sxy - CAST(sx AS DECIMAL(20,0)) * CAST(sy AS DECIMAL(20,0)) AS DECIMAL(38,0))").as("slope_num"),
        expr("CAST(CAST(n AS DECIMAL(20,0)) * sxx - CAST(sx AS DECIMAL(20,0)) * CAST(sx AS DECIMAL(20,0)) AS DECIMAL(38,0))").as("slope_den"))
      .withColumn("slope_e12",
        expr("""CAST(CASE WHEN slope_num < 0
          THEN -((abs(slope_num) * 1000000000000) div slope_den)
          ELSE (slope_num * 1000000000000) div slope_den END AS BIGINT)"""))
      .select($"event_type", $"n", $"slope_e12")
      .orderBy($"event_type")
  }

  /** Robust outlier counts per type via median absolute deviation:
    * med = p50(value), mad = p50(|value − med|), outlier ⇔
    * |value − med| > 3·mad. Two tiny per-type aggregates broadcast
    * back between three scans — never a per-group sort, never a
    * window; the modified-z-score recipe (Iglewicz–Hoaglin) that
    * survives the heavy tails plain σ-clipping does not.
    *
    * SCALE CAVEAT: exact `percentile` buffers each group's full value
    * multiset in aggregation state, and `event_type` has ~5 values —
    * at 100 TB five buffers would hold the corpus. This operator is
    * for small-cardinality-key/exact-oracle use only; the at-scale
    * twin is [[histoMedian]] (fixed-bin state, still exact integers)
    * or `approx_percentile` (fixed sketch state, no oracle).
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir).select($"event_type", $"value")
    val med = ev.groupBy($"event_type")
      .agg(percentile($"value", lit(0.5)).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs($"value" - $"med"))
    val mad = dev.groupBy($"event_type")
      .agg(percentile($"dev", lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy($"event_type", $"med", $"mad")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"dev" > $"mad" * 3.0, 1L).otherwise(0L)).as("n_outliers"))
      .select($"event_type", $"med", $"mad", $"n", $"n_outliers")
      .orderBy($"event_type")
  }

  /** Bin width (cents) for [[histoMedian]] — ~100 bins over this
    * corpus's value range; at scale pick range/1000 or so.
    */
  val HistoBinCents = 500L

  /** The AT-SCALE quantile twin ([[madOutliers]]'s caveat): median via
    * a fixed-bin integer histogram. Values become exact cents, bins
    * are `cents div binCents`, and the median bin is the first whose
    * cumulative count reaches ⌈n/2⌉. Per-group aggregation state is
    * the BIN COUNT (configuration-bounded), never the value multiset —
    * the shape that survives a 5-value grouping key at 100 TB. Exact
    * w.r.t. the binned distribution and pure integer arithmetic, so
    * the oracle replays it bit-for-bit. The cumulative window runs
    * over the per-(type, bin) AGGREGATE — ≤ bins·types rows, metadata
    * not data (the packBatchesOf precedent; plan-asserted in
    * StatsSpec).
    */
  def histoMedian(spark: SparkSession, dir: String,
      binCents: Long = HistoBinCents): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val binned = events(spark, dir)
      .select($"event_type",
        expr(s"CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div $binCents").as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("cnt"))
    val tot = binned.groupBy($"event_type").agg(sum($"cnt").as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("cum", sum($"cnt").over(w))
      .join(broadcast(tot), "event_type")
      .filter($"cum" >= expr("(n + 1) div 2"))
      .groupBy($"event_type", $"n")
      .agg(min($"bin").as("median_bin"))
      .withColumn("median_lo_cents", $"median_bin" * binCents)
      .select($"event_type", $"n", $"median_bin", $"median_lo_cents")
      .orderBy($"event_type")
  }

  /** Quantile points (percent) reported by [[histoQuantiles]] — shared
    * with the oracle SQL.
    */
  val HistoQuantilePcts = Seq(25, 50, 75, 95)

  /** [[histoMedian]] generalized to the full quantile vector — the
    * at-scale percentile family in one pass: for each percent p the
    * reported bin is the first whose cumulative count reaches
    * ⌈p·n/100⌉. One binned aggregate feeds every quantile (the
    * conditional-min trick: `min(CASE WHEN cum ≥ threshold THEN bin
    * END)` per p), so adding quantile points costs aggregate columns,
    * not passes. Per-group state stays the BIN COUNT — configuration-
    * bounded, never the value multiset — and everything is exact
    * integer arithmetic, so the oracle replays it bit-for-bit. The
    * cumulative window runs over the per-(type, bin) aggregate
    * (≤ bins·types rows, metadata not data).
    */
  def histoQuantiles(spark: SparkSession, dir: String,
      binCents: Long = HistoBinCents): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val binned = events(spark, dir)
      .select($"event_type",
        expr(s"CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div $binCents").as("bin"))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("cnt"))
    val tot = binned.groupBy($"event_type").agg(sum($"cnt").as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qCols = HistoQuantilePcts.map { p =>
      expr(s"min(CASE WHEN cum >= ($p * n + 99) div 100 THEN bin END)").as(s"p${p}_bin")
    }
    binned
      .withColumn("cum", sum($"cnt").over(w))
      .join(broadcast(tot), "event_type")
      .groupBy($"event_type", $"n")
      .agg(qCols.head, qCols.tail: _*)
      .select(($"event_type" +: $"n" +:
        HistoQuantilePcts.map(p => col(s"p${p}_bin"))): _*)
      .orderBy($"event_type")
  }

  /** Exact-integer spike detection over each type's per-minute total
    * series: flag minutes whose total (cents) deviates from the
    * type's mean by more than 3σ — decided WITHOUT sqrt or doubles by
    * squaring both sides: (n·x − Σx)² > 9·(n·Σx² − (Σx)²). Operands
    * are cast to DECIMAL *before* multiplying (the [[trendSlope]]
    * wrap lesson), so every comparison is exact DECIMAL(38,0) against
    * the oracle's HUGEINT — bit-identical, no epsilon. Headroom: at
    * 10¹² cents/minute over 10⁶ minutes dev² ≈ 10³⁶ < 10³⁸.
    *
    * Scale shape: two keyed hash aggregates (minute buckets, then the
    * per-type moment triple) + a ~5-row broadcast back over the
    * BUCKETED series — the corpus is touched once, the quadratic
    * terms live on the pre-aggregated minutes. Minutes with no events
    * are absent, not zero: the contract is the active-minute series.
    */
  def spikeMinutes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = events(spark, dir)
      .select($"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 60000000").as("minute"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("y"))
      .groupBy($"event_type", $"minute")
      .agg(sum($"y").as("total_cents"))
    val st = per.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"total_cents").as("s1"),
        sum(expr("CAST(total_cents AS DECIMAL(19,0)) * total_cents")).as("s2"))
    per.join(broadcast(st), "event_type")
      .withColumn("dev",
        expr("CAST(CAST(n AS DECIMAL(20,0)) * total_cents - s1 AS DECIMAL(38,0))"))
      .withColumn("bound",
        expr("CAST(9 AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(20,0)) * s2 - CAST(s1 AS DECIMAL(20,0)) * s1)"))
      .filter(expr("dev * dev > bound"))
      .select($"event_type", $"minute", $"total_cents")
      .orderBy($"event_type", $"minute")
  }

  /** Deterministic mode of `value` per type: the most frequent value,
    * ties broken by minimum (native `mode()` tie order is
    * engine-defined in both Spark and DuckDB — useless for an exact
    * oracle). Two hash aggregates + a broadcast of the 5-row max.
    */
  def modeValue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = events(spark, dir)
      .groupBy($"event_type", $"value")
      .agg(count(lit(1)).as("cnt"))
    val top = counts.groupBy($"event_type").agg(max($"cnt").as("mode_count"))
    counts.join(broadcast(top), "event_type")
      .filter($"cnt" === $"mode_count")
      .groupBy($"event_type", $"mode_count")
      .agg(min($"value").as("mode_value"))
      .select($"event_type", $"mode_value", $"mode_count")
      .orderBy($"event_type")
  }

  /** The Z-order clustering key surfaced as a query: Morton interleave
    * of (p_size, p_partkey % 64) over `part`, emitted in key order.
    * The oracle replays the identical mask-ladder formula, pinning the
    * layout key [[graft.engine.Layouts.zorderWrite]] sorts by.
    */
  def zorderParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "part")
      .select($"p_partkey", $"p_size".cast("long").as("p_size"),
        expr("p_partkey % 64").as("pk_mod"))
      .withColumn("z", ZOrder.morton("p_size", "pk_mod"))
      .select($"p_partkey", $"p_size", $"pk_mod", $"z")
      .orderBy($"z", $"p_partkey")
  }

  /** Rows-per-zone divisor for [[zoneMap]]: zone = z div [[ZoneWidth]]. */
  val ZoneWidth = 64L

  /** The p_size literal [[zoneMap]]'s skip-demo column evaluates. */
  val ZoneProbeSize = 7L

  /** ZONE-MAP construction over the Z-ordered `part` layout — the
    * data-skipping index a 100 TB lakehouse writes next to every file:
    * rows are binned by Morton-key range (`z div` [[ZoneWidth]], the
    * value-range analog of a file boundary after a Z-order rewrite)
    * and each zone records count + min/max of every clustered column.
    * A scan with a predicate consults ONLY this metadata table to
    * prune zones; `scan_for_size_7` demonstrates it for
    * `p_size = ` [[ZoneProbeSize]] — false rows are whole files never
    * opened. Because the key interleaves both dimensions, BOTH
    * `p_size` and `pk_mod` ranges stay narrow per zone (the point of
    * Z-order vs a single-column sort).
    *
    * Scale shape: one keyed aggregate on the map-side-computed zone id
    * — partial aggregation all the way, output is zones-count-sized
    * metadata at any corpus.
    */
  def zoneMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "part")
      .select($"p_partkey", $"p_size".cast("long").as("p_size"),
        expr("p_partkey % 64").as("pk_mod"))
      .withColumn("z", ZOrder.morton("p_size", "pk_mod"))
      .withColumn("zone", expr(s"z div $ZoneWidth"))
      .groupBy($"zone")
      .agg(count(lit(1)).as("n_rows"),
        min($"z").as("z_min"), max($"z").as("z_max"),
        min($"p_size").as("size_min"), max($"p_size").as("size_max"),
        min($"pk_mod").as("mod_min"), max($"pk_mod").as("mod_max"),
        min($"p_partkey").as("pk_min"), max($"p_partkey").as("pk_max"))
      .withColumn("scan_for_size_7",
        $"size_min" <= lit(ZoneProbeSize) && $"size_max" >= lit(ZoneProbeSize))
      .orderBy($"zone")
  }

  /** Columns [[tableStats]] profiles (integer / string / timestamp —
    * no raw doubles, whose min/max string rendering is engine-
    * formatting-sensitive).
    */
  val StatsColumns: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey",
    "l_returnflag", "l_linestatus", "l_shipdate")

  /** ANALYZE-style column statistics over `lineitem` — the table
    * profile a cost-based optimizer persists (NDV for join-order and
    * selectivity estimates, null counts, min/max for range pruning),
    * surfaced as a query so the numbers themselves are oracle-pinned.
    * One wide aggregate computes every column's stats in a single
    * pass, then `stack` unpivots to one row per column. min/max are
    * taken on the NATIVE type and cast to string after (lexicographic
    * min of digit strings would disagree with numeric min); the
    * timestamp column goes through `unix_micros` so no engine's
    * timestamp-rendering enters the hashed contract.
    *
    * Scale note: NDV is an exact `count(DISTINCT)` so DuckDB can
    * replay it — but N exact distincts in ONE wide aggregate make
    * Spark Expand every input row N+1 ways (a 7× row multiplication
    * carrying every profiled column through the shuffle; measured
    * 9.9 s at sf0.1). Instead each column gets its OWN single-distinct
    * aggregate over a pruned one-column scan — Spark plans a single
    * distinct as partial-dedup-then-merge with NO Expand, the scans
    * are independent columnar reads, and the N little jobs run back
    * to back (measured 0.9 s; at cluster scale they'd overlap).
    * The 100 TB production form swaps in `approx_count_distinct`
    * (HLL) and returns to one single-pass wide aggregate — CBO stats
    * tolerate ±2% NDV; exactness is what forces the per-column form.
    */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    def extremum(f: String, c: String) =
      if (c == "l_shipdate") s"CAST(unix_micros(CAST($f(`$c`) AS TIMESTAMP)) AS STRING)"
      else s"CAST($f(`$c`) AS STRING)"
    StatsColumns.map { c =>
      li.select(col(c))
        .agg(
          expr(s"CAST(count(DISTINCT `$c`) AS BIGINT)").as("ndv"),
          expr(s"CAST(count(CASE WHEN `$c` IS NULL THEN 1 END) AS BIGINT)").as("n_nulls"),
          expr(extremum("min", c)).as("min_value"),
          expr(extremum("max", c)).as("max_value"))
        .select(lit(c).as("column_name"), col("ndv"), col("n_nulls"),
          col("min_value"), col("max_value"))
    }.reduce(_ unionAll _).orderBy("column_name")
  }

  /** Winsorization tail fractions (p05 / p95). */
  val WinsorLo = 0.05
  val WinsorHi = 0.95

  /** WINSORIZED totals of order value per priority — the robust-sum
    * verb (one fat-finger order should not move a revenue aggregate):
    * per group the p05/p95 boundaries come from one tiny bounded-
    * domain aggregate (Spark `percentile` == DuckDB `quantile_cont`
    * bit-for-bit, the [[madOutliers]] parity), FLOORED TO WHOLE CENTS
    * so the clamp and every downstream sum is exact BIGINT arithmetic
    * — the interpolated boundary itself (a .5-exact double) never
    * enters the hashed contract. Broadcast the 5-row boundary table
    * back, clamp map-side, aggregate keyed on priority: no window, no
    * per-group sort, partial aggregation all the way at 100 TB.
    */
  def winsorized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
      .select($"o_orderpriority".as("priority"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val bounds = o.groupBy($"priority").agg(
      expr(s"CAST(floor(percentile(cents, $WinsorLo)) AS BIGINT)").as("lo"),
      expr(s"CAST(floor(percentile(cents, $WinsorHi)) AS BIGINT)").as("hi"))
    o.join(broadcast(bounds), Seq("priority"))
      .withColumn("w", expr(
        "CASE WHEN cents < lo THEN lo WHEN cents > hi THEN hi ELSE cents END"))
      .groupBy($"priority")
      .agg(count(lit(1)).as("n_orders"),
        sum(when($"cents" < $"lo", 1L).otherwise(0L)).as("n_low"),
        sum(when($"cents" > $"hi", 1L).otherwise(0L)).as("n_high"),
        sum($"cents").as("sum_cents"),
        sum($"w").as("winsorized_cents"))
      .orderBy($"priority")
  }

  /** (event_type, bucket, n1, n2, t1, t2) — each type's
    * `floor(value)` bucket counts split at the observed time-range
    * midpoint, joined with the per-type half totals: the shared
    * prelude of [[tvDrift]] (pointwise distance) and [[ksDrift]]
    * (cumulative distance). Totals ride on every cell so both
    * consumers and the shared [[halfPpm]] guard stay in one place.
    */
  private def halfSplitCells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .select($"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
        expr("CAST(floor(value) AS BIGINT)").as("bucket"))
    val bounds = ev.agg(min($"us").as("__lo"), max($"us").as("__hi"))
    val cells = ev.crossJoin(broadcast(bounds))
      .withColumn("h1", ($"us" * 2 <= $"__lo" + $"__hi").cast("long"))
      .groupBy($"event_type", $"bucket")
      .agg(sum($"h1").as("n1"), (count(lit(1)) - sum($"h1")).as("n2"))
    val tot = cells.groupBy($"event_type")
      .agg(sum($"n1").as("t1"), sum($"n2").as("t2"))
    cells.join(broadcast(tot), Seq("event_type"))
  }

  /** Truncating ppm share `n·10⁶ div t`, guarded for an EMPTY half —
    * the global midpoint means a type can have all its events in one
    * half (t=0 on the other), which must report share 0, not a
    * division error. One definition so tvDrift/ksDrift cannot drift
    * apart on the guard.
    */
  private def halfPpm(n: String, t: String): String =
    s"CASE WHEN $t = 0 THEN CAST(0 AS BIGINT) ELSE ($n * 1000000) div $t END"

  /** DISTRIBUTION-DRIFT report per event type — the monitoring verb a
    * training-data pipeline runs between two ingest windows ("did this
    * source's value distribution move?"): events are split into the
    * first and second half of the observed time range, each half's
    * `floor(value)` bucket distribution is expressed in integer ppm,
    * and the drift is the TOTAL VARIATION distance
    * `Σ|p₁−p₂| div 2` — the exact-arithmetic sibling of PSI/KL (those
    * hang on an IEEE log; TV is pure integer compare, so both engines
    * agree to the last ppm). Scale shape: one scan with a broadcast
    * (min, max) scalar fan-out, one (type, bucket) keyed aggregate,
    * one bounded per-type rollup — partial aggregation end to end,
    * no windows, no data-scaled collect.
    */
  def tvDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    halfSplitCells(spark, dir)
      .withColumn("p1", expr(halfPpm("n1", "t1")))
      .withColumn("p2", expr(halfPpm("n2", "t2")))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_buckets"), sum($"n1").as("n_first"),
        sum($"n2").as("n_second"),
        expr("sum(abs(p1 - p2)) div 2").as("tv_ppm"))
      .orderBy($"event_type")
  }

  /** KOLMOGOROV–SMIRNOV drift per event type — [[tvDrift]]'s
    * cumulative sibling: the max over buckets of |CDF₁ − CDF₂| in
    * integer ppm, over the same first-half/second-half split. TV sees
    * pointwise reshuffling; KS sees LOCATION shifts TV can understate
    * (a distribution sliding one bucket to the right moves every
    * CDF step, and KS is the statistic the classical two-sample test
    * thresholds). Exact integers throughout: cumulative counts are
    * window sums over the BOUNDED bucket domain (partitioned by type
    * — never a window over raw events), divided into ppm by
    * truncation identically in both engines.
    */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // NULLS LAST pins the cumulative order cross-engine: Spark's
    // default ascending window is NULLS FIRST where DuckDB's is NULLS
    // LAST — a NULL value bucket would shift every CDF step
    val w = Window.partitionBy($"event_type").orderBy($"bucket".asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    halfSplitCells(spark, dir)
      .withColumn("c1", sum($"n1").over(w))
      .withColumn("c2", sum($"n2").over(w))
      .withColumn("d", abs(
        expr(halfPpm("c1", "t1")) - expr(halfPpm("c2", "t2"))))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_buckets"), max($"t1").as("n_first"),
        max($"t2").as("n_second"), max($"d").as("ks_ppm"))
      .orderBy($"event_type")
  }

  /** MERGEABLE distinct-user rollup — the sketch-partial pattern that
    * makes "distinct users per day AND total" one pass at any scale:
    * each day aggregates to a DataSketches HLL sketch
    * (`hll_sketch_agg`, lgK 14), the total is the UNION of the daily
    * sketches (`hll_union_agg`) — never a second full-data distinct.
    * This is the shape a streaming rollup maintains incrementally
    * (yesterday's sketches are immutable partials; today's union is
    * cheap), where exact distinct would need the full key set again.
    * Union-of-partials equals the one-shot sketch BY CONSTRUCTION
    * (same lgK, deterministic — spec-pinned), so serving from the
    * rollup loses nothing vs re-scanning. Exact counts ride along as
    * the audit column, and the estimate surfaces as an IN-ROW BOUND
    * FLAG so the DuckDB oracle (exact counts + literal true) hash-pins
    * the error envelope; the ScalaTest spec additionally asserts
    * mergeability (union ≡ one-shot) on the raw sketches.
    */
  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // daily partials feed both the per-day report and the union-total
    // row — materialize the |days|-sized rollup once
    val daily = events(spark, dir)
      .select(to_date($"ts").as("day"), $"user_id")
      .groupBy($"day")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
        countDistinct($"user_id").as("exact_users"))
      .localCheckpoint()
    // sketch ESTIMATES are engine-specific, so the surfaced columns
    // are the exact count plus an in-row bound flag: est_in_bound is
    // true iff the estimate (per-day sketch / union-of-partials for
    // the TOTAL row) lands within 5% of exact (lgK 14 ⇒ rsd ~0.8%, so
    // 5% is >6σ — deterministic per dataset). The oracle emits exact
    // counts + literal true, making the driver's hash compare carry
    // the error envelope the ScalaTest spec asserts.
    // NULL-estimate guard lives IN the flag: a sketch over zero
    // non-null values (all-NULL user_ids in a day, or an empty corpus
    // for the TOTAL row) estimates NULL while exact is 0 — the flag
    // must then read "vacuously in bound", matching the oracle's
    // literal true, on EVERY row shape
    def inBound(est: Column, exact: Column): Column =
      coalesce(abs(est - exact) * 100L <= exact * 5L, exact === 0L)
        .as("est_in_bound")
    val perDay = daily.select($"day".cast("string").as("day"), $"exact_users",
      inBound(expr("hll_sketch_estimate(sk)"), $"exact_users"))
    // the TOTAL row's ESTIMATE serves from the UNIONED partials —
    // that is the serving-path claim this query demonstrates. The
    // exact global distinct alongside it makes this the AUDIT/BACKFILL
    // twin of the serving rollup (the driver needs exact values to
    // hash-verify the envelope): a pure serving query drops the exact
    // columns and this full-corpus distinct with them; per-day exact
    // counts cannot be merged into it, which is exactly why the
    // sketches exist.
    val exactTotal = events(spark, dir)
      .agg(countDistinct($"user_id").as("exact_users"))
    val total = daily
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("__est"))
      .crossJoin(broadcast(exactTotal))
      .select(lit("TOTAL").as("day"), $"exact_users",
        inBound($"__est", $"exact_users"))
    perDay.unionByName(total).orderBy($"day")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sketch_rollup" -> sketchRollup _,
    "q_tv_drift" -> tvDrift _,
    "q_ks_drift" -> ksDrift _,
    "q_winsorized" -> winsorized _,
    "q_trend_slope" -> trendSlope _,
    "q_mad_outliers" -> madOutliers _,
    "q_histo_median" -> ((s: SparkSession, d: String) => histoMedian(s, d)),
    "q_histo_quantiles" -> ((s: SparkSession, d: String) => histoQuantiles(s, d)),
    "q_mode_value" -> modeValue _,
    "q_spike_minutes" -> spikeMinutes _,
    "q_zorder_key" -> zorderParts _,
    "q_zone_map" -> zoneMap _,
    "q_table_stats" -> tableStats _,
  )

  val oracle: Map[String, String] = Map(
    // HLL estimates are engine-specific: the oracle pins exact counts
    // plus a literal true per bound flag (per-day AND the TOTAL row),
    // so a drifting sketch flips est_in_bound and fails the row hash.
    "q_sketch_rollup" ->
      """WITH sd AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
        |            FROM events)
        |SELECT CAST(day AS VARCHAR) AS day,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       true AS est_in_bound
        |FROM sd GROUP BY day
        |UNION ALL
        |SELECT 'TOTAL', CAST(count(DISTINCT user_id) AS BIGINT), true
        |FROM events
        |ORDER BY day""".stripMargin,
    "q_ks_drift" ->
      """WITH ke AS (SELECT event_type, epoch_us(ts) AS us,
        |             CAST(floor(value) AS BIGINT) AS bucket
        |           FROM events),
        |kbd AS (SELECT min(us) AS lo, max(us) AS hi FROM ke),
        |kc AS (SELECT event_type, bucket,
        |        CAST(sum(CASE WHEN us * 2 <= lo + hi THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN us * 2 <= lo + hi THEN 0 ELSE 1 END) AS BIGINT) AS n2
        |      FROM ke, kbd GROUP BY 1, 2),
        |kt AS (SELECT event_type, CAST(sum(n1) AS BIGINT) AS t1,
        |         CAST(sum(n2) AS BIGINT) AS t2
        |       FROM kc GROUP BY 1),
        |kcum AS (SELECT kc.event_type,
        |           CAST(sum(n1) OVER (PARTITION BY kc.event_type ORDER BY bucket NULLS LAST
        |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
        |           CAST(sum(n2) OVER (PARTITION BY kc.event_type ORDER BY bucket NULLS LAST
        |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2,
        |           t1, t2
        |         FROM kc JOIN kt USING (event_type))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(max(t1) AS BIGINT) AS n_first, CAST(max(t2) AS BIGINT) AS n_second,
        |       CAST(max(abs(
        |         CASE WHEN t1 = 0 THEN 0 ELSE (c1 * 1000000) // t1 END -
        |         CASE WHEN t2 = 0 THEN 0 ELSE (c2 * 1000000) // t2 END)) AS BIGINT) AS ks_ppm
        |FROM kcum GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_tv_drift" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
        |             CAST(floor(value) AS BIGINT) AS bucket
        |           FROM events),
        |b AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
        |c AS (SELECT event_type, bucket,
        |        CAST(sum(CASE WHEN us * 2 <= lo + hi THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN us * 2 <= lo + hi THEN 0 ELSE 1 END) AS BIGINT) AS n2
        |      FROM e, b GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n1) AS BIGINT) AS t1,
        |        CAST(sum(n2) AS BIGINT) AS t2 FROM c GROUP BY 1),
        |p AS (SELECT c.event_type, n1, n2,
        |        CASE WHEN t.t1 = 0 THEN 0 ELSE (n1 * 1000000) // t.t1 END AS p1,
        |        CASE WHEN t.t2 = 0 THEN 0 ELSE (n2 * 1000000) // t.t2 END AS p2
        |      FROM c JOIN t USING (event_type))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(sum(n1) AS BIGINT) AS n_first,
        |       CAST(sum(n2) AS BIGINT) AS n_second,
        |       CAST(sum(abs(p1 - p2)) // 2 AS BIGINT) AS tv_ppm
        |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_winsorized" ->
      s"""WITH o AS (SELECT o_orderpriority AS priority,
        |             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |           FROM orders),
        |b AS (SELECT priority,
        |        CAST(floor(quantile_cont(cents, $WinsorLo)) AS BIGINT) AS lo,
        |        CAST(floor(quantile_cont(cents, $WinsorHi)) AS BIGINT) AS hi
        |      FROM o GROUP BY 1),
        |c AS (SELECT o.priority, cents, lo, hi,
        |        CASE WHEN cents < lo THEN lo WHEN cents > hi THEN hi ELSE cents END AS w
        |      FROM o JOIN b USING (priority))
        |SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |       CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       CAST(sum(w) AS BIGINT) AS winsorized_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_trend_slope" ->
      s"""WITH base AS (
        |  SELECT event_type,
        |         epoch_us(ts) // 60000000 - $TrendEpochMinutes AS x,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM events),
        |agg AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         sum(CAST(x AS HUGEINT) * y) AS sxy,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM base GROUP BY 1),
        |nd AS (
        |  SELECT event_type, n,
        |         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
        |  FROM agg)
        |SELECT event_type, n,
        |       CAST(CASE WHEN num < 0
        |         THEN -((abs(num) * 1000000000000::HUGEINT) // den)
        |         ELSE (num * 1000000000000::HUGEINT) // den END AS BIGINT) AS slope_e12
        |FROM nd ORDER BY event_type""".stripMargin,
    "q_mad_outliers" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM ev GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
        |  FROM ev e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, d.med, a.mad, count(*) AS n,
        |       CAST(sum(CASE WHEN d.dev > a.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad a USING (event_type)
        |GROUP BY 1, 2, 3 ORDER BY d.event_type""".stripMargin,
    "q_histo_median" ->
      s"""WITH b AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // $HistoBinCents AS bin
        |  FROM events),
        |c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
        |cum AS (SELECT event_type, bin,
        |          CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |        FROM c)
        |SELECT cum.event_type, t.n, min(cum.bin) AS median_bin,
        |       min(cum.bin) * $HistoBinCents AS median_lo_cents
        |FROM cum JOIN t USING (event_type)
        |WHERE cum.cum >= (t.n + 1) // 2
        |GROUP BY 1, 2 ORDER BY event_type""".stripMargin,
    "q_histo_quantiles" ->
      s"""WITH b AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // $HistoBinCents AS bin
        |  FROM events),
        |c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
        |cum AS (SELECT event_type, bin,
        |          CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |        FROM c)
        |SELECT cum.event_type, t.n,
        |       ${HistoQuantilePcts.map(p =>
            s"min(CASE WHEN cum.cum >= ($p * t.n + 99) // 100 THEN cum.bin END) AS p${p}_bin")
            .mkString(",\n       ")}
        |FROM cum JOIN t USING (event_type)
        |GROUP BY 1, 2 ORDER BY event_type""".stripMargin,
    "q_mode_value" ->
      """WITH counts AS (
        |  SELECT event_type, value, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |top AS (
        |  SELECT event_type, max(cnt) AS mode_count
        |  FROM counts GROUP BY 1)
        |SELECT c.event_type, min(c.value) AS mode_value, t.mode_count
        |FROM counts c JOIN top t
        |  ON c.event_type = t.event_type AND c.cnt = t.mode_count
        |GROUP BY 1, 3 ORDER BY c.event_type""".stripMargin,
    "q_spike_minutes" ->
      """WITH per AS (
        |  SELECT event_type, epoch_us(ts) // 60000000 AS minute,
        |         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(total_cents) AS HUGEINT) AS s1,
        |         sum(CAST(total_cents AS HUGEINT) * total_cents) AS s2
        |  FROM per GROUP BY 1)
        |SELECT p.event_type, p.minute, p.total_cents
        |FROM per p JOIN st USING (event_type)
        |WHERE (st.n * p.total_cents - st.s1) * (st.n * p.total_cents - st.s1)
        |      > 9 * (st.n * st.s2 - st.s1 * st.s1)
        |ORDER BY p.event_type, p.minute""".stripMargin,
    "q_zorder_key" ->
      s"""SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |       p_partkey % 64 AS pk_mod,
        |       ${ZOrder.duckFragment("CAST(p_size AS BIGINT)", "p_partkey % 64")} AS z
        |FROM part ORDER BY z, p_partkey""".stripMargin,
    "q_zone_map" ->
      s"""WITH zk AS (
        |  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |         p_partkey % 64 AS pk_mod,
        |         ${ZOrder.duckFragment("CAST(p_size AS BIGINT)", "p_partkey % 64")} AS z
        |  FROM part)
        |SELECT z // $ZoneWidth AS zone, count(*) AS n_rows,
        |       min(z) AS z_min, max(z) AS z_max,
        |       min(p_size) AS size_min, max(p_size) AS size_max,
        |       min(pk_mod) AS mod_min, max(pk_mod) AS mod_max,
        |       min(p_partkey) AS pk_min, max(p_partkey) AS pk_max,
        |       min(p_size) <= $ZoneProbeSize AND max(p_size) >= $ZoneProbeSize
        |         AS scan_for_size_7
        |FROM zk GROUP BY 1 ORDER BY zone""".stripMargin,
    "q_table_stats" -> {
      val arms = StatsColumns.map { c =>
        val mn = if (c == "l_shipdate") s"CAST(epoch_us(min($c)) AS VARCHAR)"
                 else s"CAST(min($c) AS VARCHAR)"
        val mx = if (c == "l_shipdate") s"CAST(epoch_us(max($c)) AS VARCHAR)"
                 else s"CAST(max($c) AS VARCHAR)"
        s"""SELECT '$c' AS column_name,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
           |       CAST(count(CASE WHEN $c IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
           |       $mn AS min_value, $mx AS max_value
           |FROM lineitem""".stripMargin
      }
      arms.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
  )
}
