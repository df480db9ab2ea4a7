package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global (contiguous, 1-based) row numbering without the implicit
  * single-partition collapse of an ORDER-BY-only window.
  *
  * An unpartitioned `row_number() OVER (ORDER BY ...)` moves every row
  * to one reducer. That is fine when the frame is bounded by a small
  * domain (a post-aggregate leaderboard over event types) and fatal
  * when the frame scales with the data (ranking every order). This
  * object makes the two cases explicit instead of letting the plan
  * collapse silently:
  *
  *  - [[boundedRowNumber]]: the caller asserts the frame is domain-
  *    bounded; the rank runs on one explicit reducer (a constant
  *    partition key, so the plan states the intent and WindowExec does
  *    not warn about an accidental global window).
  *  - [[globalRowNumber]]: rank a data-scaled frame in three fully
  *    parallel passes — the DataFrame analog of the count-job-plus-
  *    offsets scheme `RDD.zipWithIndex` uses (spark core
  *    `ZippedWithIndexRDD`): bucket rows by quantile boundaries of the
  *    sort column, number rows within each bucket with a partitioned
  *    window, then shift each bucket by the total count of earlier
  *    buckets. The driver only ever holds one `(bucket, count)` pair
  *    per bucket — metadata, not data.
  *
  * `order` must be a total order (pin ties with a key column);
  * otherwise numbering among equal keys is nondeterministic.
  */
object Ranking {

  /** Rank a domain-bounded frame on one explicit reducer. No window at
    * all: `repartition(1)` states the single-reducer intent in the plan
    * (a constant `partitionBy(lit(0))` would be constant-folded back
    * into an unpartitioned window), upstream stages keep their
    * parallelism (unlike `coalesce(1)`, which would collapse them),
    * and the row id is the position in the totally-ordered single
    * partition.
    */
  def boundedRowNumber(df: DataFrame, as: String, order: Column*): DataFrame =
    df.repartition(1)
      .sortWithinPartitions(order: _*)
      .withColumn(as, (monotonically_increasing_id() + 1).cast("long"))

  /** Rank a data-scaled frame. `bucketCol` names a non-null numeric
    * column that leads the sort; `ascending` gives its direction;
    * `order` is the full (total) sort order, which must start with
    * `bucketCol` in that direction.
    *
    * Why not `repartitionByRange` + per-partition offsets: the range
    * partitioner re-samples (with a fresh RDD-id-derived seed) on
    * every job, so the count job and the final job could disagree on
    * partition boundaries and the offsets would be wrong. Quantile
    * boundaries are computed once on the driver and then applied as a
    * pure row expression, so every pass buckets identically. Equal
    * bucket-column values always land in one bucket (ties are never
    * split across a boundary); a heavily duplicated sort key therefore
    * skews its bucket — pick a higher-cardinality leading column if
    * that bites.
    */
  def globalRowNumber(
      df: DataFrame,
      as: String,
      buckets: Int,
      bucketCol: String,
      ascending: Boolean,
      order: Column*): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // pass 1 (column-pruned scan): approximate interior quantiles of
    // the bucket column. Any approximation error only unbalances
    // buckets; it cannot affect correctness because the boundaries are
    // fixed literals from here on.
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = df.stat.approxQuantile(bucketCol, probes, 0.001).distinct.sorted
    // bucket id = number of boundaries strictly below (asc) / above
    // (desc) the value — a pure deterministic expression, identical in
    // every pass. buckets=1 (or a constant column) degenerates to one
    // bucket; an empty array() literal would be ArrayType(NullType) and
    // fail analysis, so that case is pinned to lit(0).
    val c = col(bucketCol)
    val bucketExpr =
      if (bounds.isEmpty) lit(0)
      else {
        val boundsArr = array(bounds.toIndexedSeq.map(lit(_)): _*)
        if (ascending) size(filter(boundsArr, b => b < c))
        else size(filter(boundsArr, b => b > c))
      }
    val bucketed = df.withColumn("__bucket", bucketExpr)
    // pass 2 (metadata-sized result): rows per bucket -> cumulative
    // offsets on the driver. At most `buckets` rows ever reach the
    // driver, bounded by configuration, not data.
    val counts = bucketed.groupBy($"__bucket").agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offsetDf = broadcast(offsets.toSeq.toDF("__bucket", "__off"))
    // pass 3: number within each bucket (partitioned window — shuffles
    // on __bucket, sorts only bucket-local rows) and shift by the
    // bucket's offset
    bucketed
      .withColumn("__rn", row_number().over(
        Window.partitionBy($"__bucket").orderBy(order: _*)))
      .join(offsetDf, Seq("__bucket"))
      .withColumn(as, ($"__rn" + $"__off").cast("long"))
      .drop("__bucket", "__rn", "__off")
  }
}
