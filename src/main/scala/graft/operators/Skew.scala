package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins (builder brief: "salting for skew").
  * AQE's skew-join splitting covers sort-merge joins at runtime; this
  * is the explicit variant for when the skew is known ahead of time or
  * the join shape AQE can't split (e.g. bucketed/stream-static).
  *
  * The big side gets a random salt in [0, buckets); the small side is
  * replicated once per salt value — turning one hot key's single
  * monster partition into `buckets` even slices.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, salted `buckets` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      (rand(seed = 7) * buckets).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted
      .join(smallReplicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Salted groupBy-count: partial counts per (key, salt), then a
    * second tiny aggregation merges the salt slices. Same result as a
    * direct groupBy(key).count() — but the first shuffle spreads a hot
    * key over `buckets` reducers.
    */
  def saltedCount(df: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", (rand(seed = 7) * buckets).cast("int"))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("count"))
  }
}
