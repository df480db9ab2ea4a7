package graft.engine

/** The 100 TB sizing arithmetic as code instead of prose: given an
  * input volume and cluster shape, derive the shuffle/scan configs the
  * PERF.md design notes assume. Pure functions — a job submitter calls
  * [[confFor]] and applies the map to its session builder; the local
  * test profile (32 threads, GB-scale input) and a 1000-executor
  * 100 TB profile both fall out of the same formulas.
  */
object Sizing {
  val DefaultTargetPartitionBytes: Long = 128L * 1024 * 1024
  /** Above this many shuffle partitions, per-task scheduling overhead
    * dominates — prefer bigger partitions (AQE coalesces the rest). */
  val MaxShufflePartitions: Int = 200000

  /** Shuffle partition count: one ~128 MB partition per unit of
    * shuffled data, never fewer than the cluster's total cores (no
    * idle slots), never more than the scheduling ceiling.
    */
  def shufflePartitions(shuffleBytes: Long, totalCores: Int,
      targetPartitionBytes: Long = DefaultTargetPartitionBytes): Int = {
    require(totalCores > 0 && targetPartitionBytes > 0)
    val byVolume = math.ceil(shuffleBytes.toDouble / targetPartitionBytes).toLong
    math.min(math.max(byVolume, totalCores.toLong), MaxShufflePartitions.toLong).toInt
  }

  /** Scan split size: default 128 MB; for small inputs shrink so every
    * core gets work (a 1 GB input on 32 cores should not read as 8
    * splits).
    */
  def maxPartitionBytes(inputBytes: Long, totalCores: Int,
      target: Long = DefaultTargetPartitionBytes): Long = {
    require(totalCores > 0)
    val even = math.max(inputBytes / totalCores, 1L)
    math.max(math.min(target, even), 1L * 1024 * 1024)
  }

  /** Broadcast threshold: dimension tables up to ~1/1000 of executor
    * memory broadcast safely (the driver and every executor hold one
    * copy).
    */
  def broadcastThreshold(executorMemBytes: Long): Long =
    math.max(executorMemBytes / 1000, 10L * 1024 * 1024)

  /** The session conf map for a given workload shape. */
  def confFor(inputBytes: Long, totalCores: Int,
      executorMemBytes: Long = 8L * 1024 * 1024 * 1024): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" ->
      shufflePartitions(inputBytes, totalCores).toString,
    "spark.sql.files.maxPartitionBytes" ->
      maxPartitionBytes(inputBytes, totalCores).toString,
    "spark.sql.autoBroadcastJoinThreshold" ->
      broadcastThreshold(executorMemBytes).toString,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true")
}
