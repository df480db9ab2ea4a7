package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loaders for the driver's star-schema testdata (TESTDATA.md).
  *
  * One parquet file per table under `\$dir/`. All queries read through
  * here so that layout decisions (e.g. switching a table to a bucketed
  * or partitioned copy) happen in exactly one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") normalizeEventsTs(readEvents(spark, s"$dir/$name.parquet"))
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Read events.parquet, tolerating a TIMESTAMP(NANOS) `ts` column.
    * Spark's reader rejects parquet nanos unless
    * `spark.sql.legacy.parquet.nanosAsLong` is set — our own session
    * builder sets it, but a driver-built session may not, so on that
    * specific failure we set the flag and retry once. The conf is only
    * touched on the retry path, never as an unconditional side effect.
    */
  private def readEvents(spark: SparkSession, path: String): DataFrame =
    try {
      val df = spark.read.parquet(path)
      df.schema // schema resolution is lazy-ish; force it inside the try
      df
    } catch {
      case e: Throwable if e.getMessage != null && e.getMessage.contains("NANOS") =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }

  /** Normalize `ts` to microsecond TIMESTAMP_NTZ regardless of the
    * fixture's physical encoding. The driver has shipped events.ts as
    * int64 TIMESTAMP(NANOS) (rounds 1–8) and native timestamp[us]
    * (round 9+); hard-coding either breaks when the fixture is
    * regenerated, so dispatch on the schema actually read.
    *
    * The long→NTZ arms go through `timestampadd` on an NTZ epoch
    * literal — a timezone-INDEPENDENT construction. (`timestamp_micros`
    * + `.cast(TimestampNTZType)` would round-trip through LTZ and
    * silently shift values in a non-UTC session.)
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    def ntzFromMicros(micros: String) = expr(
      s"timestampadd(MICROSECOND, $micros, TIMESTAMP_NTZ '1970-01-01 00:00:00')")
    raw.schema("ts").dataType match {
      case LongType =>
        // int64 nanos (legacy nanosAsLong read); truncate to micros —
        // the same truncation DuckDB applies, so oracles agree
        raw.withColumn("ts", ntzFromMicros("ts div 1000"))
      case TimestampNTZType => raw
      case TimestampType    => raw.withColumn("ts", ntzFromMicros("unix_micros(ts)"))
      case other => sys.error(s"unsupported events.ts encoding: $other")
    }
  }

  /** JDBC table scan — the production equivalent of the reference's
    * Postgres source (`app.py:51-63`; SURVEY §2.3). Exercised end-to-end
    * in JdbcSpec against embedded Derby (the only SQL engine shipped in
    * `/opt/spark/jars`): fixtures written with `df.write.jdbc`, read
    * back here, asserted row-identical to the parquet path. Against a
    * production Postgres only the URL changes.
    */
  def fromJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Sharded JDBC scan: `numPartitions` executors each pull one
    * `partitionColumn` range — the form a 1000-executor cluster uses so
    * a big source table never funnels through one connection. Bounds
    * come from a cheap `SELECT min,max` the caller runs (or knows).
    */
  def fromJdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** Register every table as a temp view (for the SQL entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Run `f` with adaptive query execution OFF, restoring the prior
    * value after. For ITERATIVE drivers (min-label propagation,
    * power iteration) whose relations are already statically
    * pre-partitioned, AQE is pure per-hop overhead: every hop's action
    * fans into one job PER QUERY STAGE (measured r12: 4–6 listener
    * jobs/hop instead of 1, ~25 ms of driver planning per job), it
    * re-plans a plan whose shape never changes, and its
    * AdaptiveSparkPlanExec reports UnknownPartitioning on
    * localCheckpoint frames — the r11 finding that forced the
    * repartition-after-truncation dance. With AQE off inside the loop
    * window the static planner honors the persisted relations'
    * partitioning, checkpoints KEEP their partitioning, and each hop
    * is one job. Non-loop queries keep session AQE untouched.
    *
    * The toggle is session-conf mutation, so the window must not
    * overlap concurrent query submission on the same session — true
    * for the bench/verify drivers (sequential) and the operator call
    * sites (one loop at a time).
    */
  def withAqeOff[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prior)
  }

  /** Session builder used by library entry points when the caller does
    * not supply one. 32 shuffle partitions to match local[32]; AQE on
    * so skew/coalesce decisions re-plan at runtime (the 100 TB posture:
    * on a real cluster these same configs scale with executor count).
    */
  def session(master: String = "local[32]"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // SQL names for the native expressions (idempotent; also applies
    // when getOrCreate returns a pre-existing session)
    graft.plans.GraftExtensions.register(spark)
    spark
  }
}
