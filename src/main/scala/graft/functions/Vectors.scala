package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector helpers over `ArrayType(FloatType)` embedding columns, built
  * from codegen'd higher-order functions (no UDFs — SURVEY §7.4: the
  * whole pipeline stays inside whole-stage codegen).
  *
  * All arithmetic is promoted to Double BEFORE multiplication and
  * accumulated sequentially (the `aggregate` fold), which makes results
  * bit-comparable with an oracle that does the same.
  */
object Vectors {

  /** Cast a float array column to double elements. */
  def toDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane-style LSH bucket from the sign pattern of the
    * first `bits` dimensions (axis-aligned projections — deterministic
    * and oracle-reproducible; at scale, swap in seeded hyperplanes).
    */
  def signBucket(v: Column, bits: Int): Column =
    array_join(transform(slice(v, 1, bits), x => when(x >= 0, "1").otherwise("0")), "")

  /** Multi-probe key set for a sign bucket: the bucket itself plus all
    * `bits` buckets at hamming distance 1 (one flipped bit). Hamming-1
    * adjacency is symmetric, so expanding ONE side of a bucket join
    * covers every pair within distance 1 exactly once.
    */
  def probeBuckets(bucket: Column, bits: Int): Column =
    concat(array(bucket), transform(sequence(lit(1), lit(bits)), i =>
      concat(
        bucket.substr(lit(1), i - 1),
        when(bucket.substr(i, lit(1)) === "1", "0").otherwise("1"),
        bucket.substr(i + 1, lit(bits) - i))))
}
