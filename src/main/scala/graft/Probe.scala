package graft

import org.apache.spark.sql.functions._

/** Scratch dev probe — not part of the driver contract. Each amplified
  * fixture dir is guarded by an existence check (ADVICE r11: the
  * unguarded version crashed with a load error on any checkout without
  * the 10×/30× fixtures, and it compiles into the main artifact).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Tables.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val dirs = Seq("/root/repo/target/scale10x", "/root/repo/target/scale30x")
      .filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d, "embeddings")))
    if (dirs.isEmpty)
      println("[probe] no amplified fixtures under target/ — run graft.Amplify first")
    for (dir <- dirs) {
      println(s"== $dir")
      val e0 = graft.engine.Tables.load(spark, dir, "embeddings")
        .select($"vec_id", graft.functions.Vectors.toDouble($"embedding").as("emb"))
      t("stats posexplode")(
        e0.select(posexplode($"emb").as(Seq("dim", "x")))
          .groupBy($"dim").agg(min($"x"), max($"x")).collect())
      t("full sqTopK (run1)")(
        graft.operators.Similarity.sqTopK(spark, dir)
          .write.format("noop").mode("overwrite").save())
      t("full sqTopK (run2)")(
        graft.operators.Similarity.sqTopK(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    // plan-shape dump for the largest available fixture
    dirs.lastOption.foreach { dir =>
      val df = graft.operators.Similarity.sqTopK(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Window"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
