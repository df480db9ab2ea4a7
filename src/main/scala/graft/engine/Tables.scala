package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read the raw int64 nanos and truncate to the
      // engine's microsecond TIMESTAMP_NTZ (same truncation DuckDB
      // applies, so oracle comparisons agree). The legacy flag is a
      // session-wide engine policy (nanos parquet == int64 + explicit
      // truncation everywhere); it is also set at session construction,
      // and re-set here so driver-built sessions get it on first load.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
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
