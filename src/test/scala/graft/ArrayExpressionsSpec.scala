package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.plans.{ArrayExpressions, GraftExtensions}

class ArrayExpressionsSpec extends SparkSpec {

  test("codegen dot product matches the higher-order-function dot bit for bit") {
    import spark.implicits._
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", Vectors.toDouble($"embedding").as("emb"))
    val both = e.as("a").crossJoin(e.as("b")).limit(2000)
      .select(
        Vectors.dot(col("a.emb"), col("b.emb")).as("hof"),
        ArrayExpressions.dot(col("a.emb"), col("b.emb")).as("native"))
    assert(both.filter($"hof" =!= $"native").count() === 0)
  }

  test("codegen hamming distance counts differing bits") {
    import spark.implicits._
    val df = Seq((0L, 0L), (0L, 1L), (0L, 255L), (Long.MaxValue, 0L), (-1L, 0L))
      .toDF("x", "y")
      .select(ArrayExpressions.hamming64(col("x"), col("y")).as("d"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L, 1L, 8L, 63L, 64L))
  }

  test("extensions register graft_dot / graft_hamming64 as SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_hamming64(5L, 6L) AS h").collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === 2L)
  }
}
