package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** DATA-QUALITY conformance audits over the star schema — the
  * dbt-test / Deequ-style contract checks a pipeline runs before it
  * trusts a snapshot: referential integrity (FK orphans), key
  * uniqueness, and freshness lag. Each is a tiny bounded report whose
  * inputs are one pass over the child table — the shape that holds at
  * 100 TB because the only corpus-scaled work is an anti-join keyed on
  * the FK (broadcast when the parent is dimension-sized, shuffle
  * otherwise; AQE picks) or a keyed count.
  */
object DataQuality {

  /** The star schema's FK relations: (child, fk col, parent, pk col).
    * Configuration metadata, not data — the audit is one anti-join
    * per row of THIS list.
    */
  val FkRelations: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** REFERENTIAL-INTEGRITY audit: per FK relation, child row count,
    * orphaned child rows (no matching parent key), distinct orphaned
    * key VALUES, and NULL-FK rows. A healthy snapshot is all zeros; a
    * non-zero row names exactly which load to quarantine. NULL FKs
    * count as orphans in `n_orphans` (the strict posture — a fact row
    * that cannot join its dimension is unusable regardless of why),
    * but `n_orphan_keys` counts distinct non-NULL values only —
    * `n_null_fks` carries the NULL class explicitly so a relation
    * whose only orphans are NULL FKs doesn't read as contradictory
    * (n_orphans > 0 with n_orphan_keys = 0).
    *
    * Scale shape: per relation, the child is PRE-AGGREGATED on the FK
    * (one single-column columnar scan + a map-side-combining hash
    * aggregate) BEFORE the parent join, so the LEFT JOIN against the
    * parent's DISTINCT key projection runs on the child's distinct
    * key domain, and the distinct orphan-key count becomes a plain
    * `count` over already-unique keys (no countDistinct Expand
    * anywhere in the plan). For TRUE dimension FKs (nation, region,
    * part, supplier, customer) that domain is dimension-sized and the
    * parent broadcasts; for lineitem.l_orderkey → orders.o_orderkey
    * the distinct FK domain is ORDER-scaled — at 100 TB that parent
    * does not broadcast and the relation still pays one sort-merge
    * shuffle on the key (the pre-aggregate caps it at the key domain,
    * which is the floor for that audit). At 100 TB the fact-scaled
    * work per relation is the scan + partial aggregate of its one FK
    * column plus that one orders-sized join, and relations
    * audit independently (a fused one-scan-per-child variant was
    * measured SLOWER: parquet already reads each FK column exactly
    * once across the per-relation scans, so fusing saved no I/O and
    * paid a countDistinct Expand over the joined fact rows).
    */
  def fkOrphans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    FkRelations.map { case (child, fk, parent, pk) =>
      val p = Tables.load(spark, dir, parent)
        .select(col(pk).as("__pk")).distinct()
      Tables.load(spark, dir, child)
        .groupBy(col(fk).as("__fk")).agg(count(lit(1)).as("__n"))
        .join(p, $"__fk" === $"__pk", "left")
        .agg(coalesce(sum($"__n"), lit(0L)).as("n_child_rows"),
          coalesce(sum(when($"__pk".isNull, $"__n").otherwise(0L)), lit(0L))
            .as("n_orphans"),
          count(when($"__pk".isNull, $"__fk")).as("n_orphan_keys"),
          coalesce(sum(when($"__fk".isNull, $"__n").otherwise(0L)), lit(0L))
            .as("n_null_fks"))
        .select(lit(s"$child.$fk -> $parent.$pk").as("relation"),
          $"n_child_rows", $"n_orphans", $"n_orphan_keys", $"n_null_fks")
    }.reduce(_ unionAll _).orderBy($"relation")
  }

  /** Key-uniqueness audit: per audited (table, key), total rows,
    * distinct keys, duplicated keys, and surplus rows (rows minus
    * distinct — what a PK constraint would have rejected). One
    * key-keyed count per table, then a bounded rollup.
    */
  val PkColumns: Seq[(String, String)] = Seq(
    ("region", "r_regionkey"), ("nation", "n_nationkey"),
    ("customer", "c_custkey"), ("supplier", "s_suppkey"),
    ("part", "p_partkey"), ("orders", "o_orderkey"),
    ("events", "event_id"), ("documents", "doc_id"),
    ("embeddings", "vec_id"))

  def pkDuplicates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    PkColumns.map { case (table, pk) =>
      Tables.load(spark, dir, table)
        .groupBy(col(pk).as("__k")).agg(count(lit(1)).as("__n"))
        .agg(sum($"__n").as("n_rows"),
          count(lit(1)).as("n_distinct_keys"),
          sum(when($"__n" > 1, 1L).otherwise(0L)).as("n_dup_keys"),
          sum($"__n" - 1).as("n_surplus_rows"))
        .select(lit(s"$table.$pk").as("key"),
          $"n_rows", $"n_distinct_keys", $"n_dup_keys", $"n_surplus_rows")
    }.reduce(_ unionAll _).orderBy($"key")
  }

  /** FRESHNESS audit over the event stream: per event type, latest
    * event micros, lag behind the globally freshest event (a type
    * whose feed died shows a growing lag while the others advance),
    * and rows in the trailing day relative to the global watermark.
    * TWO corpus passes — the honest minimum, because the global
    * watermark must exist before the trailing-day filter can run —
    * plus 1-row broadcasts; the per-type rollup is localCheckpointed
    * (it is consumed by both the global max and the final report, and
    * is |types|-sized metadata).
    */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
      .select($"event_type",
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
    val per = e.groupBy($"event_type")
      .agg(max($"us").as("latest_us"), count(lit(1)).as("n_rows"))
      .localCheckpoint()
    val global = per.agg(max($"latest_us").as("__g"))
    val lastDay = e
      .crossJoin(broadcast(global))
      .filter($"us" > $"__g" - lit(86400000000L))
      .groupBy($"event_type").agg(count(lit(1)).as("n_last_day"))
    per.crossJoin(broadcast(global))
      .join(lastDay, Seq("event_type"), "left")
      .select($"event_type", $"n_rows", $"latest_us",
        ($"__g" - $"latest_us").as("lag_us"),
        coalesce($"n_last_day", lit(0L)).as("n_last_day"))
      .orderBy($"event_type")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_fk_orphans" -> fkOrphans _,
    "dq_pk_dups" -> pkDuplicates _,
    "dq_freshness" -> freshness _)

  val oracle: Map[String, String] = Map(
    "dq_fk_orphans" -> {
      val unions = FkRelations.map { case (child, fk, parent, pk) =>
        s"""SELECT '$child.$fk -> $parent.$pk' AS relation,
           |  CAST(count(*) AS BIGINT) AS n_child_rows,
           |  CAST(sum(CASE WHEN p.__pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
           |  count(DISTINCT CASE WHEN p.__pk IS NULL THEN c.$fk END) AS n_orphan_keys,
           |  CAST(sum(CASE WHEN c.$fk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_fks
           |FROM $child c LEFT JOIN (SELECT DISTINCT $pk AS __pk FROM $parent) p
           |  ON c.$fk = p.__pk""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$unions\nORDER BY relation"
    },
    "dq_pk_dups" -> {
      val unions = PkColumns.map { case (table, pk) =>
        s"""SELECT '$table.$pk' AS key,
           |  CAST(sum(__n) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS n_distinct_keys,
           |  CAST(sum(CASE WHEN __n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
           |  CAST(sum(__n - 1) AS BIGINT) AS n_surplus_rows
           |FROM (SELECT $pk AS __k, count(*) AS __n FROM $table GROUP BY 1)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$unions\nORDER BY key"
    },
    "dq_freshness" ->
      """WITH fe AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |fper AS (SELECT event_type, CAST(max(us) AS BIGINT) AS latest_us,
        |           CAST(count(*) AS BIGINT) AS n_rows
        |         FROM fe GROUP BY 1),
        |fg AS (SELECT max(latest_us) AS g FROM fper),
        |fd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_last_day
        |       FROM fe, fg WHERE us > fg.g - 86400000000 GROUP BY 1)
        |SELECT p.event_type, p.n_rows, p.latest_us,
        |       CAST(fg.g - p.latest_us AS BIGINT) AS lag_us,
        |       COALESCE(fd.n_last_day, 0) AS n_last_day
        |FROM fper p CROSS JOIN fg LEFT JOIN fd ON fd.event_type = p.event_type
        |ORDER BY p.event_type""".stripMargin)
}
