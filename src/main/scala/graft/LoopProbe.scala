package graft

/** Scratch dev probe for the min-label loop family (r12 verdict #1):
  * prints per-JOB wall-clock for dedup_clusters / graph_components at
  * the given fixture so the sf0.1 regression can be attributed to a
  * specific loop phase (relation ingest, hop jobs, truncation,
  * freeze) instead of guessed at. Not part of the driver contract.
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Tables.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (System.nanoTime(), -1L))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.computeIfPresent(je.jobId, (_, v) => (v._1, System.nanoTime()))
    })
    val queries = Seq(
      "dedup_clusters" -> graft.operators.Dedup.all("dedup_clusters"),
      "graph_components" -> graft.operators.Graph.all("graph_components"))
    for ((name, fn) <- queries) {
      // priming run (layout caches, ANN-style session state, JIT)
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache(); System.gc()
      jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      val done = {
        import scala.jdk.CollectionConverters._
        jobs.asScala.toSeq.sortBy(_._1)
          .map { case (id, (s, e)) => (id, if (e < 0) -1.0 else (e - s) / 1e6) }
      }
      println(f"== $name: $total%.3f s, ${done.size} jobs")
      done.foreach { case (id, ms) => println(f"   job $id%3d  $ms%8.1f ms") }
      val jobSum = done.filter(_._2 > 0).map(_._2).sum / 1000.0
      println(f"   job-covered $jobSum%.3f s; gaps ${total - jobSum}%.3f s")
    }
    spark.stop()
  }
}
