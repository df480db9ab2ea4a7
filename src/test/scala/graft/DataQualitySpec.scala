package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality

class DataQualitySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("fk audit reports every relation and a clean fixture has zero orphans") {
    import spark.implicits._
    val rows = DataQuality.fkOrphans(spark, dir).collect()
    assert(rows.map(_.getAs[String]("relation")).toSeq ===
      DataQuality.FkRelations.map { case (c, fk, p, pk) => s"$c.$fk -> $p.$pk" }.sorted)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_child_rows") > 0L, r.getAs[String]("relation"))
      assert(r.getAs[Long]("n_orphans") === 0L, r.getAs[String]("relation"))
      assert(r.getAs[Long]("n_orphan_keys") === 0L, r.getAs[String]("relation"))
    }
  }

  test("fk audit counts planted orphans exactly, NULL FKs in their own column") {
    import spark.implicits._
    // shift some lineitems' orderkey far past the orders domain and
    // NULL others (keyed on l_partkey so the plant is deterministic) —
    // the two orphan classes must land in n_orphans together but
    // split across n_orphan_keys / n_null_fks
    val dirTmp = java.nio.file.Files.createTempDirectory("graft-dq").toString
    val li = graft.engine.Tables.load(spark, dir, "lineitem")
      .withColumn("l_orderkey",
        when($"l_partkey" % 7 === 3, lit(null).cast("long"))
          .when($"l_partkey" % 5 === 0, $"l_orderkey" + 1000000000L)
          .otherwise($"l_orderkey"))
    li.write.mode("overwrite").parquet(s"$dirTmp/lineitem.parquet")
    for (t <- Seq("orders", "part", "supplier", "customer", "nation", "region"))
      graft.engine.Tables.load(spark, dir, t)
        .write.mode("overwrite").parquet(s"$dirTmp/$t.parquet")
    val r = DataQuality.fkOrphans(spark, dirTmp).collect()
      .find(_.getAs[String]("relation") == "lineitem.l_orderkey -> orders.o_orderkey").get
    val written = spark.read.parquet(s"$dirTmp/lineitem.parquet")
    val shifted = written.filter($"l_orderkey" >= 1000000000L).count()
    val nulled = written.filter($"l_orderkey".isNull).count()
    assert(shifted > 0L && nulled > 0L)
    assert(r.getAs[Long]("n_orphans") === shifted + nulled)
    assert(r.getAs[Long]("n_orphan_keys") ===
      written.filter($"l_orderkey" >= 1000000000L)
        .select($"l_orderkey").distinct().count())
    assert(r.getAs[Long]("n_null_fks") === nulled)
  }

  test("pk audit is internally consistent and clean on the fixture") {
    val rows = DataQuality.pkDuplicates(spark, dir).collect()
    assert(rows.length === DataQuality.PkColumns.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_keys") === 0L, r.getAs[String]("key"))
      assert(r.getAs[Long]("n_rows") === r.getAs[Long]("n_distinct_keys"),
        r.getAs[String]("key"))
      assert(r.getAs[Long]("n_surplus_rows") ===
        r.getAs[Long]("n_rows") - r.getAs[Long]("n_distinct_keys"))
    }
  }

  test("freshness lag is zero for the freshest type and non-negative everywhere") {
    val rows = DataQuality.freshness(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("lag_us") === 0L))
    rows.foreach { r =>
      assert(r.getAs[Long]("lag_us") >= 0L)
      assert(r.getAs[Long]("n_last_day") <= r.getAs[Long]("n_rows"))
    }
  }
}
