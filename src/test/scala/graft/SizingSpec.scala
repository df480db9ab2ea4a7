package graft

import graft.engine.Sizing

/** The sizing formulas at both ends of the scale range. */
class SizingSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val GB = 1024L * 1024 * 1024
  private val TB = 1024L * GB

  test("local test profile: small input still uses every core") {
    assert(Sizing.shufflePartitions(1 * GB, totalCores = 32) == 32)
    // 1 GB / 32 cores -> 32 MB splits, not 8x 128 MB
    assert(Sizing.maxPartitionBytes(1 * GB, 32) == 32L * 1024 * 1024)
  }

  test("100 TB profile: volume-driven partitions under the scheduling ceiling") {
    // 10 TB -> volume-driven: one ~128 MB partition per unit of shuffle
    assert(Sizing.shufflePartitions(10 * TB, totalCores = 8000)
      == math.ceil(10.0 * TB / Sizing.DefaultTargetPartitionBytes).toInt)
    // 100 TB of SHUFFLE exceeds the scheduling ceiling -> clamped; the
    // resulting ~512 MB partitions are the explicit spill-aware
    // trade-off (AQE splits the skewed ones)
    assert(Sizing.shufflePartitions(100 * TB, 8000) == Sizing.MaxShufflePartitions)
    assert(Sizing.maxPartitionBytes(100 * TB, 8000) == Sizing.DefaultTargetPartitionBytes)
  }

  test("confFor emits a complete AQE-on profile") {
    val conf = Sizing.confFor(100 * TB, 8000, executorMemBytes = 16 * GB)
    assert(conf("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(conf("spark.sql.autoBroadcastJoinThreshold").toLong == 16 * GB / 1000)
  }
}
